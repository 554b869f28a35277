"""GuidanceStack param-threading convention: components whose weights live
in `stack.params[<key>]` are called as fn(params, x); closure-style
components as fn(x). Threading keeps multi-GB frozen weights out of jit
lowering constants (they become traced arguments)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fairdiff.guidance.face_feats import FaceFeatsDB
from fairdiff.training.stack import GuidanceStack
from fairdiff.training.synthetic import (
    oracle_detect, synthetic_slices, synthetic_stack,
)


def _threaded_stack():
    w_cls = jnp.full((3, 8), 0.5)
    w_feat = jnp.eye(3)
    feats = jnp.eye(3, 3)
    return GuidanceStack(
        detect_fn=oracle_detect,  # closure style (no "detector" key)
        classify_fn=lambda p, chips: chips.mean(axis=(1, 2)) @ p,  # threaded
        slices=synthetic_slices(("gender",)),
        clip_feat_fn=lambda p, x: x.mean(axis=(1, 2)) @ p,
        face_embed_fn=lambda p, a: a.mean(axis=(1, 2)) @ p,
        chip_size=32,
        aligned_size=32,
        img_size_small=0,
        params={
            "classifier": w_cls,
            "clip": w_feat,
            "face_embed": w_feat,
            "face_db": FaceFeatsDB(feats, jnp.zeros(3, jnp.int32), {}),
        },
    )


def test_threaded_stack_analyze_inside_jit():
    stack = _threaded_stack()
    images = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3), minval=-1)

    @jax.jit
    def run(gparams, images):
        res = stack.analyze(images, params=gparams)
        return res.attrs["gender"].probs, res.face_feats

    probs, face_feats = run(stack.params, images)
    assert probs.shape == (2, 2) and face_feats.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)

    # same result as eager (params taken from stack.params fallback)
    res2 = stack.analyze(images)
    np.testing.assert_allclose(
        np.asarray(res2.attrs["gender"].probs), np.asarray(probs), rtol=1e-5
    )

    # get_db prefers the threaded params dict; empty/None falls back to
    # the stack's own params
    assert stack.get_db(stack.params) is stack.params["face_db"]
    assert stack.get_db({}) is stack.params["face_db"]
    assert stack.get_db(None) is stack.params["face_db"]


def test_closure_stack_unchanged():
    stack = synthetic_stack(("gender",))
    assert stack.params == {}
    images = jnp.zeros((2, 64, 64, 3))
    res = stack.analyze(images)
    assert res.attrs["gender"].probs.shape == (2, 2)
    assert stack.get_db(None) is stack.face_db


def test_mixed_styles_coexist():
    stack = dataclasses.replace(
        _threaded_stack(),
        dino_feat_fn=lambda x: x.mean(axis=(1, 2)),  # closure, no "dino" key
    )
    clip_f, dino_f = stack.semantic_feats(jnp.ones((2, 16, 16, 3)))
    assert clip_f.shape == (2, 3) and dino_f.shape == (2, 3)
