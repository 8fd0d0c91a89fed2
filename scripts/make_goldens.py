#!/usr/bin/env python
"""Regenerate tests/golden/*.json seeded end-to-end goldens.

Run on CPU after an INTENTIONAL semantic change to the product path
(tokenizer/vocab, model layout, renderer): `python scripts/make_goldens.py`.
Every value here is produced by the same public API the golden tests drive;
the tests then pin the instruct / reconstruct / portrait paths against
refactors (VERDICT r3 item 7).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def f(x):
    return float(np.asarray(x))


def pipeline_golden():
    from avi_talking_tpu.core import synthetic_assets
    from avi_talking_tpu.pipeline import AviTalkingPipeline, PipelineConfig

    pipe = AviTalkingPipeline.random_init(
        PipelineConfig.tiny(), flame_assets=synthetic_assets(n_shape=8, n_exp=6)
    )
    wav = np.sin(np.linspace(0, 2 * np.pi * 220, 8000)).astype(np.float32) * 0.3
    out = pipe.generate(
        wav, "A fairly angry man speaks with brow fairly down", seed=42
    )
    return {
        "frames": int(out["exp"].shape[0]),
        "style_emb_first8": np.asarray(out["style_emb"][:8]).tolist(),
        "exp_mean": f(out["exp"].mean()),
        "exp_std": f(out["exp"].std()),
        "vertices_mean_abs": f(np.abs(out["vertices"]).mean()),
    }


def reconstruct_golden():
    import jax.numpy as jnp

    from avi_talking_tpu.core import FlameModel, synthetic_assets
    from avi_talking_tpu.core.projection import batch_orth_proj
    from avi_talking_tpu.models.emoca import EmocaEncoder
    from avi_talking_tpu.viz.shading import render_shaded

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    enc = EmocaEncoder(n_exp=6)
    variables = enc.init(jax.random.PRNGKey(0), img)
    codes = enc.apply(variables, img, train=False)
    assets = synthetic_assets(n_shape=8, n_exp=6)
    flame = FlameModel(assets, n_shape=8, n_exp=6)
    verts = flame.vertices_only(
        codes["shape"][:, :8], codes["exp"][:, :6],
        jnp.concatenate([jnp.zeros_like(codes["pose"][:, :3]),
                         codes["pose"][:, 3:]], axis=1))
    proj = batch_orth_proj(verts, jnp.asarray([[8.0, 0.0, -0.01]]))
    ndc = jnp.stack([proj[..., 0], -proj[..., 1], -proj[..., 2]], axis=-1)
    shaded = render_shaded(ndc, assets.faces, 32, 32)
    return {
        "exp_first4": np.asarray(codes["exp"][0, :4]).tolist(),
        "pose_first4": np.asarray(codes["pose"][0, :4]).tolist(),
        "verts_mean_abs": f(np.abs(verts).mean()),
        "shaded_mean": f(shaded.mean()),
    }


def portrait_golden():
    import jax.numpy as jnp

    from avi_talking_tpu.models.pirender import FaceGenerator, PIRenderConfig
    from avi_talking_tpu.pipeline.portrait import (
        PortraitRenderer,
        build_semantics,
    )

    rng = np.random.default_rng(11)
    src = jnp.asarray(rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32))
    exp = rng.standard_normal((6, 6)).astype(np.float32) * 0.3
    jaw = rng.standard_normal((6, 3)).astype(np.float32) * 0.1
    descr = build_semantics(exp, jaw)
    import dataclasses as dc

    cfg = dc.replace(PIRenderConfig.tiny(), coeff_nc=int(descr.shape[-1]))
    gen = FaceGenerator(cfg)
    gvars = gen.init(jax.random.PRNGKey(3), jnp.zeros((1, 16, 16, 3)),
                     jnp.zeros((1, 27, cfg.coeff_nc)))
    out = PortraitRenderer(gen, gvars, chunk=8).render(src, descr,
                                                       return_warp=True)
    return {
        "fake_mean": f(out["fake"].mean()),
        "fake_std": f(out["fake"].std()),
        "warp_mean": f(out["warp"].mean()),
        "fake_first_pixel": np.asarray(out["fake"][0, 0, 0]).tolist(),
    }


def train_golden():
    """Seeded 3-step losses of the four trainers (prior / emote geometric /
    emoca / pirender) — case builders shared with test_golden.py via
    tests/golden_cases.py."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from golden_cases import TRAIN_CASES

    return {name: fn() for name, fn in TRAIN_CASES.items()}


if __name__ == "__main__":
    goldens = {
        "tiny_pipeline.json": pipeline_golden(),
        "tiny_reconstruct.json": reconstruct_golden(),
        "tiny_portrait.json": portrait_golden(),
        "tiny_train.json": train_golden(),
    }
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, data in goldens.items():
        path = os.path.join(GOLDEN_DIR, name)
        with open(path, "w") as fp:
            json.dump(data, fp, indent=1)
        print(f"wrote {path}")
