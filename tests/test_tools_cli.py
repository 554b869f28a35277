"""End-to-end drives of the offline tool CLIs (reference SURVEY.md §3.2-3.4:
2-export-checkpoint.py, gen-images.py, eval-generated-images.py), in-process
on the CPU mesh with tiny/synthetic models."""

import json
import pickle
from pathlib import Path

import numpy as np
import pytest



import pytest

pytestmark = pytest.mark.slow  # fast subset: pytest -m 'not slow'

def test_gen_images_resume_and_eval(tmp_path):
    """gen-images: deterministic noise bank + skip-existing resume
    (gen-images.py:546-571), then eval-generated-images over the output
    (annotated grids + test_results.pkl, eval-generated-images.py:706-709)."""
    from fairdiff.tools.gen_images import GenImagesConfig, main as gen_main

    save_dir = tmp_path / "imgs"
    cfg = GenImagesConfig(
        tiny_smoke=True, num_imgs_per_prompt=2, batch_size=2,
        num_denoising_steps=2, save_dir=str(save_dir),
    )
    paths = gen_main(cfg)
    files = sorted(save_dir.rglob("*.jpg"))
    assert len(files) == 2
    mtimes = {p: p.stat().st_mtime_ns for p in files}

    # resume: nothing regenerated
    gen_main(cfg)
    assert {p: p.stat().st_mtime_ns for p in files} == mtimes

    from fairdiff.tools.eval_images import EvalImagesConfig, main as eval_main

    out = tmp_path / "eval"
    res = eval_main(EvalImagesConfig(
        synthetic_smoke=True,
        generated_imgs_dir=str(save_dir),
        save_dir=str(out),
        batch_size=2,
    ))
    pkl = out / "prompt_0_test_results.pkl"
    assert pkl.exists()
    with open(pkl, "rb") as f:
        payload = pickle.load(f)
    # reference format: [face_indicators, face_bboxs, gender_logits,
    # race_logits, age_logits] (eval-generated-images.py:706-709)
    assert len(payload) == 5
    assert isinstance(res, dict) and "prompt_0" in res
    assert (out / "summary.pkl").exists()
    grids = list(out.rglob("*.jpg"))
    assert grids, "no annotated grid written"


def test_export_checkpoint_roundtrip(tmp_path):
    """export tool: restore a saved training state and write standalone
    adapter (.npz) files incl. EMA (2-export-checkpoint.py:619-642)."""
    import jax

    from fairdiff.io.adapters_io import load_adapters
    from fairdiff.tools.export_checkpoint import ExportConfig, main as export_main
    from fairdiff.tools.train_debias import TrainCLIConfig, build_trainer
    from fairdiff.training.checkpoints import DualCadenceCheckpointer

    _, trainer, _ = build_trainer(
        TrainCLIConfig(experiment="exp1", tiny_smoke=True, seed=7)
    )
    state = trainer.init_state(jax.random.key(7))
    ckpt_dir = tmp_path / "ckpts"
    ckpt = DualCadenceCheckpointer(ckpt_dir, tmp_every=1, perm_every=1)
    ckpt.maybe_save(state)
    ckpt.wait()

    out = export_main(ExportConfig(
        experiment="exp1", tiny_smoke=True, seed=7,
        checkpoint_dir=str(ckpt_dir), output_dir=str(tmp_path / "exported"),
    ))
    exported = load_adapters(Path(out) / "te_lora.npz")
    orig = state.adapters["te_lora"]
    got = jax.tree_util.tree_leaves(exported)
    want = jax.tree_util.tree_leaves(orig)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    assert (Path(out) / "te_lora_EMA.npz").exists()

    # reference-format export: the .pth must re-import to the same tree
    out2 = export_main(ExportConfig(
        experiment="exp1", tiny_smoke=True, seed=7,
        checkpoint_dir=str(ckpt_dir), output_dir=str(tmp_path / "ref_exp"),
        reference_format=True,
    ))
    pth = Path(out2) / "text_encoder_lora.pth"
    assert pth.exists() and (Path(out2) / "text_encoder_lora_EMA.pth").exists()
    from fairdiff.io import reference_adapters as ra

    back = ra.load_reference_te_lora(str(pth))
    for a, b in zip(jax.tree_util.tree_leaves(back), want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_eval_facerec_cli(tmp_path):
    """opensphere test.py parity: config-driven backbone + PairDataset
    verification metrics through the eval_facerec CLI."""
    import yaml
    from PIL import Image

    from fairdiff.tools.eval_facerec import EvalFaceRecCLIConfig, main

    img_dir = tmp_path / "val"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8), "RGB"
        ).save(img_dir / f"im{i}.jpg")
    ann = tmp_path / "pairs.txt"
    ann.write_text(
        "im0.jpg im1.jpg 1\nim0.jpg im2.jpg 0\n"
        "im1.jpg im3.jpg 0\nim2.jpg im3.jpg 1\n"
    )
    cfg = {
        "data": {"val": [{"dataset": {
            "type": "PairDataset", "name": "tiny-lfw",
            "data_dir": str(img_dir), "ann_path": str(ann),
        }}]},
        "model": {"backbone": {
            "type": "sfnet4", "out_channel": 16, "in_size": 32,
            "channels": [4, 4, 8, 8],
        }},
    }
    cfg_path = tmp_path / "test.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    results = main(EvalFaceRecCLIConfig(config=str(cfg_path), batch_size=2))
    metrics = dict(results["tiny-lfw"])
    assert "ACC" in metrics and 0.0 <= metrics["ACC"] <= 100.0
    assert "AUC" in metrics and "EER" in metrics


def test_convert_guidance_cli(tmp_path):
    """convert_guidance assembles the model_zoo layout from whatever
    artifacts are given (converter functions have their own goldens)."""
    import pickle

    import numpy as np

    from fairdiff.tools.convert_guidance import (
        GuidanceConvertConfig, main as convert_main,
    )

    pkl = tmp_path / "face_feats.pkl"
    feats = np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32)
    with open(pkl, "wb") as f:
        pickle.dump((feats, np.zeros(4, np.int64), np.zeros((4, 2))), f)
    npz = tmp_path / "det.npz"
    np.savez(npz, **{"stem/kernel": np.zeros((3, 3, 3, 8), np.float32)})

    out = convert_main(GuidanceConvertConfig(
        out_dir=str(tmp_path / "zoo"),
        face_feats_pkl=str(pkl),
        detector_npz=str(npz),
    ))
    assert (out / "face_feats.pkl").exists()
    assert (out / "detector.npz").exists()


def test_cli_parse_both_config_flavors(tmp_path):
    """--config means 'dataclass-override YAML' for most CLIs but is a
    regular field for the facerec CLIs (it names the experiment YAML).
    Registering both used to crash argparse with a conflicting-option
    error, breaking every `python -m fairdiff.tools.*_facerec` invocation."""
    import dataclasses

    from fairdiff.utils.config import cli_parse

    @dataclasses.dataclass(frozen=True)
    class WithConfigField:
        config: str = ""
        seed: int = 0

    got = cli_parse(
        WithConfigField, ["--config", "exp.yml", "--seed", "3"]
    )
    assert got.config == "exp.yml" and got.seed == 3

    @dataclasses.dataclass(frozen=True)
    class WithoutConfigField:
        lr: float = 0.1
        name: str = "a"

    yml = tmp_path / "o.yaml"
    yml.write_text("lr: 0.5\n")
    got2 = cli_parse(
        WithoutConfigField, ["--config", str(yml), "--name", "b"]
    )
    assert got2.lr == 0.5 and got2.name == "b"

    # real CLI configs keep parsing through argparse (the regression was
    # import-time-invisible: only parse_args crashed)
    from fairdiff.tools.eval_facerec import EvalFaceRecCLIConfig
    from fairdiff.tools.train_facerec import FaceRecCLIConfig

    assert cli_parse(FaceRecCLIConfig, ["--config", "x.yml"]).config == "x.yml"
    assert cli_parse(EvalFaceRecCLIConfig, ["--batch_size", "8"]).batch_size == 8


def test_full_workflow_train_export_generate_eval(tmp_path):
    """The reference's user workflow end-to-end in one chain
    (exp-1 README steps: train -> export checkpoint -> gen-images with
    the exported adapters -> eval-generated-images): each stage consumes
    the previous stage's on-disk artifacts, nothing passed in memory."""
    import yaml

    from fairdiff.tools.train_debias import TrainCLIConfig, main as train_main
    from fairdiff.utils.config import cli_parse

    # stage 1: train (tiny 4-phase run, auto-exports adapters)
    base = yaml.safe_load(
        open("fairdiff/configs/exp1_tiny_cpu.yaml")
    )
    base["output_dir"] = str(tmp_path / "train")
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(base))
    train_main(cli_parse(TrainCLIConfig, ["--config", str(cfg_path)]))
    te_npz = tmp_path / "train" / "exported" / "te_lora_EMA.npz"
    assert te_npz.exists()

    # stage 2: generate with the exported adapters (and a baseline
    # without them: the trained LoRA must actually change the images)
    from fairdiff.tools.gen_images import GenImagesConfig, main as gen_main

    gen_kwargs = dict(
        tiny_smoke=True, num_imgs_per_prompt=2, batch_size=2,
        num_denoising_steps=2,
    )
    gen_main(GenImagesConfig(
        save_dir=str(tmp_path / "imgs_base"), **gen_kwargs,
    ))
    gen_main(GenImagesConfig(
        save_dir=str(tmp_path / "imgs"),
        load_text_encoder_lora_from=str(te_npz), **gen_kwargs,
    ))
    imgs = sorted((tmp_path / "imgs").rglob("*.jpg"))
    base_imgs = sorted((tmp_path / "imgs_base").rglob("*.jpg"))
    assert len(imgs) == 2
    assert any(
        a.read_bytes() != b.read_bytes() for a, b in zip(imgs, base_imgs)
    ), "exported adapters had no effect on generation"

    # stage 3: offline bias eval over the generated folder
    from fairdiff.tools.eval_images import EvalImagesConfig, main as eval_main

    res = eval_main(EvalImagesConfig(
        synthetic_smoke=True,
        generated_imgs_dir=str(tmp_path / "imgs"),
        save_dir=str(tmp_path / "eval"),
        batch_size=2,
    ))
    assert (tmp_path / "eval" / "summary.pkl").exists()
    assert isinstance(res, dict) and res


def test_config_coerce_strings_to_sequences():
    """CLI/YAML scalar strings coerce to typed sequences by comma-split —
    never by char iteration ('gender' must not become ('g','e',...))."""
    import dataclasses

    from fairdiff.utils.config import from_dict

    @dataclasses.dataclass(frozen=True)
    class C:
        attrs: tuple[str, ...] = ("gender",)
        steps: tuple[int, ...] = ()
        facs: tuple[float, ...] = ()

    got = from_dict(C, {
        "attrs": "gender", "steps": "40000, 60000", "facs": "0.2,0.3",
    })
    assert got.attrs == ("gender",)
    assert got.steps == (40000, 60000)
    assert got.facs == (0.2, 0.3)
    # real lists untouched
    assert from_dict(C, {"attrs": ["gender", "race"]}).attrs == ("gender", "race")


def test_guidance_zoo_sfnet_variant_roundtrip(tmp_path):
    """The converter records the SFNet variant and the loader rebuilds
    the SAME residual ordering: the weight trees are shape-identical
    across sfnet20 / sfnet20_deprecated, so a mismatch is silent — only
    a behavioral check catches it (reference checkpoints are the
    deprecated pre-act family, exp-1:970-989)."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    from fairdiff.io.adapters_io import save_adapters
    from fairdiff.models.sfnet import SFNet, SFNetConfig
    from fairdiff.training.model_zoo import load_guidance_stack

    cfg_dep = SFNetConfig.for_variant("sfnet20_deprecated")
    assert cfg_dep.pre_act_residual is True
    assert SFNetConfig.for_variant("sfnet20").pre_act_residual is False

    net_dep = SFNet(cfg_dep, dtype=jnp.bfloat16)
    params = net_dep.init(
        jax.random.key(0), jnp.zeros((1, 112, 112, 3))
    )["params"]

    zoo = tmp_path / "zoo"
    zoo.mkdir()
    save_adapters(zoo / "face_embedder.npz", params)
    (zoo / "face_embedder_variant.txt").write_text("sfnet20_deprecated")
    # minimal mandatory files (contents unused by this test's call path)
    save_adapters(zoo / "detector.npz", {"w": np.zeros((1,), np.float32)})
    save_adapters(zoo / "classifier.npz", {"w": np.zeros((1,), np.float32)})

    stack = load_guidance_stack(zoo, ("gender",))
    chips = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (2, 112, 112, 3)), jnp.float32
    )
    got = stack.face_embed_fn(stack.params["face_embed"], chips)
    bf16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    want = net_dep.apply({"params": bf16}, chips)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=1e-2, atol=1e-2,
    )
    # the non-deprecated ordering gives DIFFERENT embeddings on the same
    # weights — proving the variant file actually matters
    other = SFNet(SFNetConfig.for_variant("sfnet20"), dtype=jnp.bfloat16)
    alt = other.apply({"params": bf16}, chips)
    assert float(jnp.abs(got.astype(jnp.float32) - alt.astype(jnp.float32)).max()) > 1e-3


def test_setup_data_synthesize_then_check(tmp_path):
    """The synthetic bundle is loadable by the production readers and the
    checker reports exactly the items the bundle cannot contain (weights)."""
    from fairdiff.guidance.face_feats import FaceFeatsDB
    from fairdiff.io.prompts import load_occupation_prompts
    from fairdiff.tools.setup_data import SetupDataConfig, check, synthesize

    out = synthesize(SetupDataConfig(synthetic_out=str(tmp_path / "bundle")))
    dd = load_occupation_prompts(out / "1-prompts/occupation.json")
    assert dd["train_prompts"] and dd["val_prompts"] and dd["test_prompts"]

    db1 = FaceFeatsDB.from_pickle(out / "3-face-features/exp1/face_feats.pkl")
    assert db1.feats.shape == (64, 512) and "race" not in db1.extra
    db3 = FaceFeatsDB.from_pickle(out / "3-face-features/exp3/face_feats.pkl")
    assert "race" in db3.extra and db3.extra["race"].shape == (64,)

    missing = check(SetupDataConfig(data_dir=str(out)))
    # prompts + face feats are present; classifiers/backbones by design not
    for exp in ("exp1", "exp5"):
        assert all("classifier" in m or "opensphere" in m for m in missing[exp])
    assert "held-out test classifiers" in missing["eval"][0]


@pytest.mark.slow
def test_convergence_demo_cli(tmp_path):
    """2-step smoke of the synthetic convergence demo: metrics.jsonl written
    with the gap/fairness keys, curves rendered."""
    from fairdiff.tools.convergence_demo import DemoConfig, main as demo_main

    out = tmp_path / "conv"
    demo_main(DemoConfig(steps=2, output_dir=str(out), plot=True))
    lines = (out / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert "gender_gap_abs" in rec and "train_loss_fair" in rec
    assert (out / "curves" / "gender_gap_abs.png").exists()

    # the r5 OT demo modes drive their engines through the same CLI
    # (tiny lanes: execution smoke only — the committed 150-step runs
    # in docs/convergence/ are the convergence evidence)
    out6 = tmp_path / "conv6"
    demo_main(DemoConfig(
        experiment="exp6", steps=1, train_images_per_prompt=4,
        output_dir=str(out6), plot=False,
    ))
    rec6 = json.loads((out6 / "metrics.jsonl").read_text().splitlines()[0])
    assert "race_gap" in rec6


def test_guidance_zoo_two_stage_detector(tmp_path):
    """With BOTH det_10g.onnx and detector.npz present the zoo composes
    SCRFD-primary + FaceDetectorNet-fallback (exp-1:1192-1215 two-stage
    parity): params['detector'] carries both trees and detection runs
    under jit end to end."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    from test_onnx_bridge import _scrfd_like_model

    from fairdiff.io.adapters_io import save_adapters
    from fairdiff.models.face_detector import DetectorConfig, FaceDetectorNet
    from fairdiff.training.model_zoo import load_guidance_stack

    zoo = tmp_path / "zoo"
    zoo.mkdir()
    (zoo / "det_10g.onnx").write_bytes(_scrfd_like_model())
    det_net = FaceDetectorNet(DetectorConfig())
    net_params = det_net.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3))
    )["params"]
    save_adapters(zoo / "detector.npz", net_params)
    save_adapters(zoo / "classifier.npz", {"w": np.zeros((1,), np.float32)})

    stack = load_guidance_stack(zoo, ("gender",))
    assert set(stack.params["detector"]) == {"primary", "fallback"}
    imgs = jnp.asarray(
        np.random.default_rng(3).uniform(-1, 1, (2, 64, 64, 3)), jnp.float32
    )
    det = jax.jit(stack.detect_fn)(stack.params["detector"], imgs)
    assert det.indicators.shape == (2,)
    assert det.bboxes.shape == (2, 4)

    # missing both detector files is a hard error, not a silent stack
    import pytest

    empty = tmp_path / "empty"
    empty.mkdir()
    save_adapters(empty / "classifier.npz", {"w": np.zeros((1,), np.float32)})
    with pytest.raises(FileNotFoundError):
        load_guidance_stack(empty, ("gender",))


def test_eval_images_two_stage_scrfd_parity(tmp_path):
    """tools/eval_images runs the SAME detector stack as training: with
    scrfd_onnx + detector_params both set, _load_stack composes
    SCRFD-primary + FaceDetectorNet-fallback via model_zoo.load_detector
    (the reference eval's insightface->dlib two-stage,
    eval-generated-images.py:343-366,:574-580), and the e2e run writes
    the reference pkl/grid artifacts. A fallback-only config and an
    scrfd-only config both keep working."""
    import jax
    import jax.numpy as jnp
    from test_onnx_bridge import _scrfd_like_model

    from fairdiff.io.adapters_io import save_adapters
    from fairdiff.io.images import save_image
    from fairdiff.models.face_detector import DetectorConfig, FaceDetectorNet
    from fairdiff.models.mobilenet_v3 import MobileNetV3Large
    from fairdiff.tools.eval_images import (
        EvalImagesConfig, _load_stack, main as eval_main,
    )

    zoo = tmp_path / "zoo"
    zoo.mkdir()
    (zoo / "det_10g.onnx").write_bytes(_scrfd_like_model())
    det_net = FaceDetectorNet(DetectorConfig())
    save_adapters(
        zoo / "detector.npz",
        det_net.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))["params"],
    )
    mnv3 = MobileNetV3Large(num_classes=2)
    save_adapters(
        zoo / "gender.npz",
        mnv3.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)))["params"],
    )

    imgs_dir = tmp_path / "imgs" / "prompt_0"
    imgs_dir.mkdir(parents=True)
    rng = np.random.default_rng(5)
    for i in range(2):
        save_image(rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32),
                   imgs_dir / f"img_{i}.jpg")

    cfg = EvalImagesConfig(
        generated_imgs_dir=str(tmp_path / "imgs"),
        save_dir=str(tmp_path / "eval"),
        scrfd_onnx=str(zoo / "det_10g.onnx"),
        detector_params=str(zoo / "detector.npz"),
        gender_classifier=str(zoo / "gender.npz"),
        scrfd_input_size=(32, 32),
        batch_size=2,
        chip_size=64,
    )
    detect_fn, params, heads = _load_stack(cfg)
    # the composed two-stage: both weight trees threaded through jit
    assert set(params["detector"]) == {"primary", "fallback"}
    assert set(heads) == {"gender"}

    res = eval_main(cfg)
    assert "prompt_0" in res
    with open(tmp_path / "eval" / "prompt_0_test_results.pkl", "rb") as f:
        payload = pickle.load(f)
    assert len(payload) == 5  # [inds, bboxs, gender, race, age] (ref order)
    assert payload[2] is not None and payload[3] is None and payload[4] is None
    assert (tmp_path / "eval" / "prompt_0_grid.jpg").exists()

    # fallback-only (no SCRFD file) still loads and runs — the pre-r5 mode
    cfg_fb = EvalImagesConfig(
        generated_imgs_dir=str(tmp_path / "imgs"),
        save_dir=str(tmp_path / "eval_fb"),
        detector_params=str(zoo / "detector.npz"),
        gender_classifier=str(zoo / "gender.npz"),
        batch_size=2, chip_size=64,
    )
    _, p_fb, _ = _load_stack(cfg_fb)
    assert "primary" not in p_fb["detector"]
    assert eval_main(cfg_fb)

    # scrfd-only: primary alone, no fallback tree
    cfg_sc = EvalImagesConfig(
        generated_imgs_dir=str(tmp_path / "imgs"),
        save_dir=str(tmp_path / "eval_sc"),
        scrfd_onnx=str(zoo / "det_10g.onnx"),
        gender_classifier=str(zoo / "gender.npz"),
        scrfd_input_size=(32, 32),
        batch_size=2, chip_size=64,
    )
    _, p_sc, _ = _load_stack(cfg_sc)
    assert "fallback" not in p_sc["detector"]
    assert eval_main(cfg_sc)

    # neither detector file is a hard error, not a silent weaker stack
    with pytest.raises(FileNotFoundError):
        _load_stack(EvalImagesConfig(
            generated_imgs_dir=str(tmp_path / "imgs"),
            gender_classifier=str(zoo / "gender.npz"),
        ))
