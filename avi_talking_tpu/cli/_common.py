"""Shared CLI helpers: pipeline assembly, output saving, common flags."""

from __future__ import annotations

import os
import sys
import time  # noqa: F401


def _build_pipeline(args):
    import jax.numpy as jnp

    from ..core.assets import default_assets_path, load_flame_assets, synthetic_assets
    from ..pipeline import AviTalkingPipeline, PipelineConfig

    if args.tiny:
        cfg = PipelineConfig.tiny()
        assets = synthetic_assets(n_shape=cfg.emote.n_shape, n_exp=cfg.emote.n_exp)
    else:
        cfg = PipelineConfig()
        npz = args.flame_npz or default_assets_path()
        assets = load_flame_assets(npz, cfg.emote.n_shape, cfg.emote.n_exp) if npz else None
        if assets is None:
            print(
                "[warn] no FLAME assets (set --flame-npz or AVI_TALKING_FLAME_NPZ); "
                "emitting exp/jaw coefficients only",
                file=sys.stderr,
            )
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    pipe = AviTalkingPipeline.random_init(cfg, flame_assets=assets, dtype=dtype)
    if args.checkpoint:
        from ..infra.checkpoint import restore_checkpoint

        pipe.params = restore_checkpoint(args.checkpoint, target=pipe.params)
    return pipe


def _save_outputs(out, out_dir: str, name: str, pipe, args) -> None:
    import numpy as np

    os.makedirs(out_dir, exist_ok=True)
    np.savez(
        os.path.join(out_dir, f"{name}_coeffs.npz"),
        exp=out["exp"],
        jaw=out["jaw"],
        style_emb=out["style_emb"],
    )
    if "vertices" in out and args.save_video:
        from ..viz import FlameVisualizer

        faces = np.asarray(pipe.head.flame_assets.faces)
        viz = FlameVisualizer(faces, image_size=args.image_size)
        path = viz.visualize_verts(
            out["vertices"], os.path.join(out_dir, f"{name}.mp4")
        )
        print(f"  video: {path}")


def common_args(sp):
    """Flags shared by the product-pipeline commands."""
    sp.add_argument("--tiny", action="store_true", help="tiny test config")
    sp.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    sp.add_argument("--flame-npz", default=None)
    sp.add_argument("--checkpoint", default=None)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--cond-scale", type=float, default=1.0)
    sp.add_argument("--out", default="outputs")
    sp.add_argument("--save-video", action="store_true")
    sp.add_argument("--image-size", type=int, default=256)
