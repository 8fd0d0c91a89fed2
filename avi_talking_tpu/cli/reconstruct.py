"""EMOCA reconstruction + asset tooling: reconstruct / stats /
convert-flame."""

from __future__ import annotations

import os
import sys


def cmd_stats(args) -> int:
    from ..data import MeadEmocaDataset

    ds = MeadEmocaDataset(root=args.root)
    stats = ds.compute_stats(max_clips=args.max_clips)
    stats.save(args.mean_out, args.std_out)
    print(f"wrote {args.mean_out} / {args.std_out} from {len(ds)} clips")
    return 0


def cmd_reconstruct(args) -> int:
    """EMOCA-style reconstruction (the reference's EMOCA demo apps,
    gdl_apps/EMOCA ``test_emoca_on_images``/``test_emoca_on_video``):
    image(s) -> coarse codes -> FLAME -> shaded renders. ``--image`` may be
    one PNG or a directory of frames (a decoded video).

    Runs the full compute path; with imported EMOCA weights
    (models.emoca.emoca_encoder_params_from_torch fed via --checkpoint) the
    codes are the real reconstruction, otherwise a random-init smoke.
    """
    import glob as _glob

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..core import FlameModel
    from ..core.assets import default_assets_path, load_flame_assets, synthetic_assets
    from ..core.projection import batch_orth_proj
    from ..models.emoca import EmocaEncoder
    from ..viz.pngio import read_image_normalized, write_png
    from ..viz.shading import render_shaded

    if os.path.isdir(args.image):
        paths = sorted(_glob.glob(os.path.join(args.image, "*.png")))
        if not paths:
            print(f"no PNG frames in {args.image}", file=sys.stderr)
            return 1
    else:
        paths = [args.image]
    imgs = np.stack([read_image_normalized(p) for p in paths])  # [-1, 1]
    x = jnp.asarray(imgs) * 0.5 + 0.5  # encoder expects [0, 1]

    n_shape, n_exp = (8, 6) if args.tiny else (100, 50)
    n_detail = 4 if args.tiny else 128
    # full-size DECA/EMOCA code layout (236 + 50), plus E_detail on request
    enc = EmocaEncoder(with_detail=args.detail, n_detail=n_detail)
    variables = enc.init(jax.random.PRNGKey(0), x[:1])
    if args.checkpoint:
        from ..infra.checkpoint import restore_checkpoint

        variables = restore_checkpoint(args.checkpoint, target=variables)
    # chunked encode (EmocaPreprocessor's max_b batching, Preprocessors.py:381)
    apply = jax.jit(lambda v, xx: enc.apply(v, xx))
    chunks = [apply(variables, x[i : i + 8]) for i in range(0, x.shape[0], 8)]
    codes = {k: jnp.concatenate([c[k] for c in chunks]) for k in chunks[0]}
    if args.tiny:  # slice onto the synthetic-asset PCA dims
        codes = {**codes, "shape": codes["shape"][:, :n_shape],
                 "exp": codes["exp"][:, :n_exp]}

    npz = args.flame_npz or default_assets_path()
    if args.tiny or not npz:
        assets = synthetic_assets(n_shape=n_shape, n_exp=n_exp)
    else:
        assets = load_flame_assets(npz, n_shape, n_exp)
    flame = FlameModel(assets, n_shape=n_shape, n_exp=n_exp)
    verts = flame.vertices_only(
        codes["shape"], codes["exp"],
        jnp.concatenate([jnp.zeros_like(codes["pose"][:, :3]),
                         codes["pose"][:, 3:]], axis=1),
    )
    proj = batch_orth_proj(verts, jnp.asarray([[8.0, 0.0, -0.01]]))
    ndc = jnp.stack([proj[..., 0], -proj[..., 1], -proj[..., 2]], axis=-1)
    shaded = render_shaded(ndc, assets.faces, args.size, args.size)

    def _uv_assets():
        # UVs from --uv-obj (head_template.obj) or planar template projection
        if args.uv_obj:
            from ..viz.meshio import read_obj

            mesh = read_obj(args.uv_obj)
            return jnp.asarray(mesh.uvs), jnp.asarray(
                mesh.face_uvs if mesh.face_uvs is not None else mesh.faces)
        t = np.asarray(assets.v_template)
        span = t.max(0) - t.min(0) + 1e-6
        return jnp.asarray(((t - t.min(0)) / span)[:, :2]), assets.faces

    textured = None
    if args.textured:
        # EMOCA's predicted_images analog: PCA albedo (FLAMETex) sampled
        # through per-corner UVs + SH lighting (SRenderY.forward textured
        # path, gdl/models/Renderer.py)
        from ..core.flame import FlameTex
        from ..viz.shading import render_textured

        uv_coords, uv_faces = _uv_assets()
        if args.tex_npz:
            ftex = FlameTex.from_npz(args.tex_npz,
                                     n_tex=codes["tex"].shape[1])
            albedo = ftex(codes["tex"])  # (B, 512, 512, 3)
        else:
            print("reconstruct --textured: no --tex-npz (the external FLAME "
                  "texture download); rendering flat grey albedo",
                  file=sys.stderr)
            albedo = jnp.full((x.shape[0], 8, 8, 3), 0.6)
        textured = render_textured(ndc, assets.faces, uv_coords, uv_faces,
                                   albedo, args.size, args.size)

    detail_maps = None
    if args.detail:
        # detail displacement branch (Visualizer3DMM's EMOCA detail model)
        from ..models.deca_detail import DecaDetailModel, DetailGenerator

        uv_coords, uv_faces = _uv_assets()
        gen = DetailGenerator(
            latent_dim=3 + n_exp + n_detail,
            init_size=2 if args.tiny else 8)
        gvars = gen.init(jax.random.PRNGKey(1),
                         jnp.zeros((1, 3 + n_exp + n_detail)))
        if args.detail_checkpoint:
            # real D_detail weights: orbax dir (our layout) or a torch
            # EMOCA/DECA ckpt routed through the deca_detail importer
            if os.path.isdir(args.detail_checkpoint):
                from ..infra.checkpoint import restore_checkpoint

                gvars = restore_checkpoint(args.detail_checkpoint,
                                           target=gvars)
            else:
                import torch as _torch

                from ..models.deca_detail import (
                    detail_generator_params_from_torch,
                )

                sd = _torch.load(args.detail_checkpoint, map_location="cpu",
                                 weights_only=False)
                if isinstance(sd, dict) and "state_dict" in sd:
                    sd = sd["state_dict"]
                pref = ""
                for cand in ("D_detail.", "deca.D_detail.",
                             "model.D_detail."):
                    if any(k.startswith(cand) for k in sd):
                        pref = cand
                        break
                gvars = detail_generator_params_from_torch(sd, prefix=pref)
        else:
            print("reconstruct --detail: no --detail-checkpoint given; "
                  "the detail branch runs with RANDOM weights (smoke path, "
                  "normal maps are noise)", file=sys.stderr)
        model = DecaDetailModel(
            generator=gen, variables=gvars, faces=assets.faces,
            uv_coords=uv_coords, uv_faces=uv_faces,
            uv_size=64 if args.tiny else 256)
        detail_maps, _ = model.decode(
            codes["pose"][:, 3:], codes["exp"], codes["detail"], verts)

    os.makedirs(args.out_dir, exist_ok=True)
    base = os.path.splitext(os.path.basename(args.image.rstrip("/")))[0]
    np.savez(os.path.join(args.out_dir, f"{base}_codes.npz"),
             **{k: np.asarray(v) for k, v in codes.items()},
             vertices=np.asarray(verts))
    if detail_maps is not None:
        for j, p in enumerate(paths):
            fn = os.path.splitext(os.path.basename(p))[0]
            nm = (np.asarray(detail_maps[j]) * 0.5 + 0.5)
            write_png(os.path.join(args.out_dir, f"{fn}_detail_normals.png"),
                      (np.clip(nm, 0, 1) * 255).astype(np.uint8))
    if textured is not None:
        for j, p in enumerate(paths):
            fn = os.path.splitext(os.path.basename(p))[0]
            write_png(os.path.join(args.out_dir, f"{fn}_textured.png"),
                      (np.clip(np.asarray(textured[j]), 0, 1) * 255)
                      .astype(np.uint8))
    if len(paths) == 1:
        write_png(os.path.join(args.out_dir, f"{base}_geometry.png"),
                  (np.clip(np.asarray(shaded[0]), 0, 1) * 255).astype(np.uint8))
        print(f"wrote {base}_codes.npz + {base}_geometry.png to {args.out_dir}")
    else:
        for p, frame in zip(paths, np.asarray(shaded)):
            fn = os.path.splitext(os.path.basename(p))[0]
            write_png(os.path.join(args.out_dir, f"{fn}_geometry.png"),
                      (np.clip(frame, 0, 1) * 255).astype(np.uint8))
        print(f"wrote {base}_codes.npz + {len(paths)} geometry frames to "
              f"{args.out_dir}")
    return 0


def cmd_convert_flame(args) -> int:
    import os as _os

    from ..core.assets import convert_flame_pickle

    _os.makedirs(_os.path.dirname(_os.path.abspath(args.out)), exist_ok=True)
    out = convert_flame_pickle(
        args.pkl, args.out, args.lmk_embedding, args.mediapipe_lmk_embedding
    )
    print(f"wrote {out}")
    return 0


def register(sub, common):
    rc = sub.add_parser("reconstruct", help="EMOCA single-image reconstruction")
    rc.add_argument("--image", required=True, help="input PNG")
    rc.add_argument("--out-dir", default="out")
    rc.add_argument("--size", type=int, default=256)
    rc.add_argument("--tiny", action="store_true")
    rc.add_argument("--flame-npz", default=None)
    rc.add_argument("--checkpoint", default=None)
    rc.add_argument("--detail", action="store_true",
                    help="also run the DECA detail displacement branch")
    rc.add_argument("--detail-checkpoint", default=None,
                    help="D_detail weights: orbax dir or torch EMOCA ckpt "
                         "(without it the detail branch is random-init)")
    rc.add_argument("--uv-obj", default=None,
                    help="head_template.obj for real FLAME UVs")
    rc.add_argument("--textured", action="store_true",
                    help="also write SH-lit textured renders (EMOCA's "
                         "predicted_images; PCA albedo needs --tex-npz)")
    rc.add_argument("--tex-npz", default=None,
                    help="FLAME texture npz (mean + tex_dir/basis); without "
                         "it --textured uses a flat grey albedo")
    rc.set_defaults(fn=cmd_reconstruct)
    s = sub.add_parser("stats", help="regenerate Mead coeff stats")
    s.add_argument("--root", required=True)
    s.add_argument("--mean-out", default="coeff_mean_Mead.npy")
    s.add_argument("--std-out", default="coeff_std_Mead.npy")
    s.add_argument("--max-clips", type=int, default=200)
    s.set_defaults(fn=cmd_stats)

    cf = sub.add_parser("convert-flame", help="FLAME generic_model.pkl -> npz")
    cf.add_argument("--pkl", required=True)
    cf.add_argument("--out", default="assets/flame.npz")
    cf.add_argument("--lmk-embedding", default=None)
    cf.add_argument("--mediapipe-lmk-embedding", default=None)
    cf.set_defaults(fn=cmd_convert_flame)
