"""Production guidance-stack assembly from converted weights.

The frozen zoo of the reference (exp-1-debias-gender/1-main-debias.py:
929-994) wired into a GuidanceStack. Expected directory layout (each file
produced by the fairdiff.io converters / tools):

  <dir>/det_10g.onnx            insightface SCRFD detector (preferred:
                                executed via fairdiff.io.onnx_bridge —
                                weight-identical to the reference's
                                buffalo_l, exp-1:938-945)
  <dir>/detector.npz            FaceDetectorNet params (fallback: the
                                first-party trainable detector)
  <dir>/classifier.npz          MobileNetV3 attribute classifier
  <dir>/clip_vision/            orbax tree (CLIP-ViT-H) [optional]
  <dir>/dinov2/                 orbax tree (DINOv2 ViT-B/14) [optional]
  <dir>/face_embedder.npz       SFNet backbone [optional]
  <dir>/face_feats.pkl          CelebA face-feature DB [optional]
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp

from fairdiff.guidance.attributes import (
    celeba_slices,
    fairface_gender_race_age_slices,
    fairface_gender_race_slices,
)
from fairdiff.guidance.face_feats import FaceFeatsDB
from fairdiff.io.adapters_io import load_adapters
from fairdiff.models.clip_vision import CLIPVisionConfig, CLIPVisionModel
from fairdiff.models.dinov2 import DINOv2Config, DINOv2Model
from fairdiff.models.face_detector import (
    DetectorConfig,
    FaceDetectorNet,
    make_detect_fn,
)
from fairdiff.models.mobilenet_v3 import MobileNetV3Large
from fairdiff.models.sfnet import SFNet, SFNetConfig
from fairdiff.training.stack import (
    GuidanceStack,
    normalize_for_clip,
    normalize_for_dino,
)


def _slices_for(attributes: tuple[str, ...]):
    if attributes == ("gender",):
        return celeba_slices(), 80
    if attributes in (("gender", "race"), ("race",)):
        return fairface_gender_race_slices(), 6
    if attributes == ("gender", "race", "age"):
        return fairface_gender_race_age_slices(), 8
    raise ValueError(attributes)


def load_detector(
    scrfd_onnx: str | Path | None,
    detector_npz: str | Path | None,
    *,
    dtype=jnp.bfloat16,
    scrfd_input_size: tuple[int, int] = (640, 640),
):
    """Assemble the detection stack from weight paths — the SAME two-stage
    composition for training and offline eval (the reference runs identical
    insightface->dlib detection in both: exp-1:1192-1215 and
    eval-generated-images.py:343-366,:574-580). SCRFD (exact reference
    weights via the onnx bridge) is the primary; the first-party
    FaceDetectorNet fills lanes SCRFD misses. With only one path given,
    that detector runs alone. Returns (detect_fn(params, images), params).
    """
    from fairdiff.io.checkpoints import cast_floats

    onnx_fn = net_fn = None
    if scrfd_onnx:
        from fairdiff.io.onnx_bridge import load_scrfd

        onnx_fn, onnx_params = load_scrfd(
            str(scrfd_onnx), input_size=scrfd_input_size
        )
        # keep the onnx graph in its stored f32: the reference executes
        # this detector in fp32 through onnxruntime (exp-1:938-945), the
        # weights are ~17MB, and box-regression heads are precision-
        # sensitive; the bridge runs whatever dtype the tree carries
    if detector_npz:
        det_cfg = DetectorConfig()
        det_net = FaceDetectorNet(det_cfg, dtype=dtype)
        net_params = cast_floats(load_adapters(detector_npz), dtype)
        net_fn = make_detect_fn(det_net, det_cfg)
    if onnx_fn and net_fn:
        from fairdiff.guidance.faces import compose_detect_fns

        return (
            compose_detect_fns(onnx_fn, net_fn),
            {"primary": onnx_params, "fallback": net_params},
        )
    if onnx_fn:
        return onnx_fn, onnx_params
    if net_fn:
        return net_fn, net_params
    raise FileNotFoundError(
        "no detector weights: need a SCRFD det_10g.onnx (reference "
        "weights) and/or a detector .npz (tools/train_detector output)"
    )


def load_guidance_stack(
    directory: str | Path,
    attributes: tuple[str, ...],
    *,
    dtype=jnp.bfloat16,
) -> GuidanceStack:
    d = Path(directory)
    slices, n_logits = _slices_for(tuple(attributes))

    from fairdiff.io.checkpoints import cast_floats

    # All weights go into stack.params so the trainer can thread them
    # through jit as arguments (not closure-captured lowering constants);
    # frozen weights live in `dtype` (bf16 default — reference fp16 cast).
    params: dict = {}

    detect_fn, params["detector"] = load_detector(
        (d / "det_10g.onnx") if (d / "det_10g.onnx").exists() else None,
        (d / "detector.npz") if (d / "detector.npz").exists() else None,
        dtype=dtype,
    )

    mnv3 = MobileNetV3Large(num_classes=n_logits, dtype=dtype)
    params["classifier"] = cast_floats(load_adapters(d / "classifier.npz"), dtype)
    classify_fn = lambda p, chips: mnv3.apply({"params": p}, chips)

    clip_fn = dino_fn = face_fn = None
    if (d / "clip_vision").exists():
        from fairdiff.io.checkpoints import load_params

        clip = CLIPVisionModel(CLIPVisionConfig.vit_h14(), dtype=dtype)
        params["clip"] = load_params(d, ["clip_vision"], cast=dtype)["clip_vision"]

        def clip_fn(p, images):
            x = normalize_for_clip(images)
            x = jax.image.resize(x, (x.shape[0], 224, 224, 3), "bilinear")
            e = clip.apply({"params": p}, x)["image_embeds"]
            e = e.astype(jnp.float32)
            return e / jnp.linalg.norm(e, axis=-1, keepdims=True).clip(1e-6)

    if (d / "dinov2").exists():
        from fairdiff.io.checkpoints import load_params

        dino = DINOv2Model(DINOv2Config.vitb14(), dtype=dtype)
        params["dino"] = load_params(d, ["dinov2"], cast=dtype)["dinov2"]

        def dino_fn(p, images):
            x = normalize_for_dino(images)
            x = jax.image.resize(x, (x.shape[0], 224, 224, 3), "bilinear")
            e = dino.apply({"params": p}, x).astype(jnp.float32)
            return e / jnp.linalg.norm(e, axis=-1, keepdims=True).clip(1e-6)

    if (d / "face_embedder.npz").exists():
        # the residual ordering (sfnet20 vs sfnet20_deprecated) is not
        # inferable from the weight tree — read the variant the converter
        # recorded; the reference's shipped opensphere checkpoints are the
        # deprecated (pre-act) family (exp-1:970-989), hence the default
        vfile = d / "face_embedder_variant.txt"
        variant = (
            vfile.read_text().strip() if vfile.exists()
            else "sfnet20_deprecated"
        )
        sfnet = SFNet(SFNetConfig.for_variant(variant), dtype=dtype)
        params["face_embed"] = cast_floats(load_adapters(d / "face_embedder.npz"), dtype)
        face_fn = lambda p, chips: sfnet.apply({"params": p}, chips)

    if (d / "face_feats.pkl").exists():
        params["face_db"] = FaceFeatsDB.from_pickle(d / "face_feats.pkl")

    return GuidanceStack(
        detect_fn=detect_fn,
        classify_fn=classify_fn,
        slices=slices,
        clip_feat_fn=clip_fn,
        dino_feat_fn=dino_fn,
        face_embed_fn=face_fn,
        params=params,
    )
