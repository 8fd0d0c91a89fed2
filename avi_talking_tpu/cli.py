"""Command-line interface — the experiments/*.sh equivalent.

Subcommands:
  generate   one (wav, instruction) pair -> coeffs npz (+ meshes / video)
  instruct   batch over a caption corpus (experiments/json_dir format) —
             the reference's `diffusion_test.sh align_emote` product path
             (train_diffusion_prior.py:655-774)
  portrait   PIRender photoreal portrait video from generated coeffs
             (inference_flame.py / coef_control.py equivalent)
  bench      run the single-chip RTF benchmark
  serve      micro-batched serving over a corpus (InferenceServer: batch
             coalescing + warmup precompile + p50/p99 stats)
  import-prior / import-emote  reference torch checkpoints -> orbax
  import-clip vendor + validate the CLIP BPE vocab into assets/
  train-prior diffusion-prior training loop (synthetic, or a real caption
             corpus via --json-dir/--root: frozen CLIP voxels + frozen
             EMOTE style targets, the prepare_train_data bridge)
  train-emote staged EMOTE training loop (geometric -> disentangled;
             real MEAD batches + held-out val split via --root)
  train-flint FLINT motion-prior VAE/VQ training (real motion via --root)
  reconstruct EMOCA-style single-image -> FLAME codes + geometry render
  stats      regenerate Mead coefficient statistics from a dataset root
  translate-captions  Style-B prose -> Style-A instructions (offline)

Checkpoints/assets are optional: without them the models run random-init
(compute-path smoke); pass --flame-npz / --checkpoint for real outputs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _build_pipeline(args):
    import jax.numpy as jnp

    from .core.assets import default_assets_path, load_flame_assets, synthetic_assets
    from .pipeline import AviTalkingPipeline, PipelineConfig

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
        from .infra.checkpoint import restore_checkpoint

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
        from .viz import FlameVisualizer

        faces = np.asarray(pipe.head.flame_assets.faces)
        viz = FlameVisualizer(faces, image_size=args.image_size)
        path = viz.visualize_verts(
            out["vertices"], os.path.join(out_dir, f"{name}.mp4")
        )
        print(f"  video: {path}")


def cmd_generate(args) -> int:
    pipe = _build_pipeline(args)
    t0 = time.time()
    out = pipe.generate(args.wav, args.text, seed=args.seed,
                        cond_scale=args.cond_scale)
    name = os.path.splitext(os.path.basename(args.wav))[0]
    _save_outputs(out, args.out, name, pipe, args)
    print(
        f"generate: {out['exp'].shape[0]} frames in {time.time()-t0:.2f}s "
        f"-> {args.out}/{name}_coeffs.npz"
    )
    return 0


def cmd_instruct(args) -> int:
    from .data import CaptionDataset

    ds = CaptionDataset(args.json_dir, args.wav_dir)
    pipe = _build_pipeline(args)
    times = []
    for item in ds:
        for ci, caption in enumerate(item.captions):
            t0 = time.time()
            out = pipe.generate(item.wav_path, caption, seed=args.seed)
            times.append(time.time() - t0)
            _save_outputs(out, args.out, f"{item.name}_cap{ci}", pipe, args)
            print(f"[{item.name}/{ci}] {caption[:60]!r} -> "
                  f"{out['exp'].shape[0]} frames ({times[-1]:.2f}s)")
    if times:
        print(f"avg per-sample wall time: {sum(times)/len(times):.3f}s")
    return 0


def cmd_portrait(args) -> int:
    """PIRender photoreal portrait video from generated coefficients.

    The reference's PIRender inference tooling (third_party/pirender/
    inference_flame.py:99-125, coef_control.py:40-136): a source portrait +
    the ``generate`` coeff npz (or a ``--control`` semantic sweep) drive
    ``net_G``; output is a ``[warp |] fake`` strip video.  Frames render in
    jitted chunks (whole-sequence batched, not the reference's per-frame
    loop)."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from .models.pirender import (
        FaceGenerator,
        PIRenderConfig,
        pirender_params_from_torch,
    )
    from .pipeline.portrait import (
        PortraitRenderer,
        build_semantics,
        control_schedule,
        write_strip_video,
    )
    from .viz.pngio import read_png

    src_u8 = read_png(args.source)
    if src_u8.shape[-1] == 4:
        src_u8 = src_u8[..., :3]
    elif src_u8.shape[-1] in (1, 2):
        src_u8 = np.repeat(src_u8[..., :1], 3, axis=-1)
    src = jnp.asarray(src_u8, jnp.float32) / 127.5 - 1.0
    S = args.image_size
    if src.shape[:2] != (S, S):
        src = jax.image.resize(src, (S, S, 3), "bilinear")

    if args.control:
        n_exp = args.control_exp_dims
        base = np.zeros(n_exp + 9, np.float32)
        base[n_exp + 6 :] = np.asarray(args.cam, np.float32)
        descr, legs = control_schedule(base, num=args.control_steps)
        name = "control"
        print(f"control sweep: {len(legs)} legs, {descr.shape[0]} frames")
    else:
        if not args.coeffs:
            raise SystemExit("portrait needs --coeffs (or --control)")
        npz = np.load(args.coeffs)
        exp, jaw = npz["exp"], npz["jaw"]
        descr = build_semantics(exp, jaw, cam=jnp.asarray(args.cam))
        name = os.path.splitext(os.path.basename(args.coeffs))[0]

    cfg = PIRenderConfig.tiny() if args.tiny else PIRenderConfig()
    cfg = _dc.replace(cfg, coeff_nc=int(descr.shape[-1]))
    gen = FaceGenerator(cfg, dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    if args.net_g:
        import torch as _torch

        if cfg.coeff_nc != 59:
            raise SystemExit(
                f"--net-g expects the 59-d FLAME descriptor (exp50), got "
                f"{cfg.coeff_nc}-d coeffs")
        sd = _torch.load(args.net_g, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "net_G_ema" in sd:
            sd = sd["net_G_ema"]  # trainer ckpt layout (base.py save_checkpoint)
        elif isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        gvars = pirender_params_from_torch(sd, cfg)
    else:
        gvars = gen.init(
            jax.random.PRNGKey(args.seed),
            jnp.zeros((1, S, S, 3)),
            jnp.zeros((1, 27, cfg.coeff_nc)),
        )
        print("portrait: RANDOM-init net_G (smoke semantics; pass --net-g "
              "for real renders)", file=sys.stderr)

    renderer = PortraitRenderer(gen, gvars, chunk=args.chunk)
    t0 = time.time()
    out = renderer.render(src, descr, return_warp=args.save_warp)
    streams = ([out["warp"], out["fake"]] if args.save_warp
               else [out["fake"]])
    os.makedirs(args.out, exist_ok=True)
    path = write_strip_video(
        os.path.join(args.out, f"{name}_portrait.mp4"), *streams,
        audio_path=args.wav)
    print(f"portrait: {descr.shape[0]} frames in {time.time()-t0:.2f}s "
          f"-> {path}")
    return 0


def cmd_bench(args) -> int:
    import runpy

    runpy.run_path(os.path.join(os.path.dirname(__file__), "..", "bench.py"),
                   run_name="__main__")
    return 0


def cmd_stats(args) -> int:
    from .data import MeadEmocaDataset

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

    from .core import FlameModel
    from .core.assets import default_assets_path, load_flame_assets, synthetic_assets
    from .core.projection import batch_orth_proj
    from .models.emoca import EmocaEncoder
    from .viz.pngio import read_image_normalized, write_png
    from .viz.shading import render_shaded

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
        from .infra.checkpoint import restore_checkpoint

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
            from .viz.meshio import read_obj

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
        from .core.flame import FlameTex
        from .viz.shading import render_textured

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
        from .models.deca_detail import DecaDetailModel, DetailGenerator

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
                from .infra.checkpoint import restore_checkpoint

                gvars = restore_checkpoint(args.detail_checkpoint,
                                           target=gvars)
            else:
                import torch as _torch

                from .models.deca_detail import (
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



def cmd_train_emote(args) -> int:
    """Staged EMOTE training loop (train/emote_driver.py): geometric stage
    then optional condition-exchange stage; synthetic batches without a data
    root (real MEAD batches via data.mead + batching)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .models.conditioning import StyleCondition
    from .models.emote import EmoteConfig, EmoteTalkingHead
    from .train.emote_driver import EmoteStage, train_emote

    cfg = EmoteConfig.tiny() if args.tiny else EmoteConfig()
    neural = None
    flame_assets = None
    if args.neural:
        # perceptual stage: differentiable render + frozen towers in-graph
        # (random-init without checkpoints — smoke semantics; real towers
        # come via the lipread/EmoNet importers)
        import jax.numpy as _jnp

        from .core import synthetic_assets
        from .core.assets import default_assets_path, load_flame_assets
        from .models.emoca import EmoNetLoss, EmotionRecognitionModule
        from .models.lipread import LipReadingLoss, LipReadingNet
        from .models.video_emotion import (
            VideoEmotionClassifier,
            VideoEmotionLoss,
        )
        from .train.talking_head import NeuralLosses
        from .viz.visualizer import FixedViewRenderer

        if args.tiny:
            flame_assets = synthetic_assets(n_shape=cfg.n_shape,
                                            n_exp=cfg.flint.n_exp)
            R, lip = 24, 24
        else:
            npz = args.flame_npz if hasattr(args, "flame_npz") else None
            npz = npz or default_assets_path()
            flame_assets = (load_flame_assets(npz, cfg.n_shape, cfg.n_exp)
                            if npz else synthetic_assets(
                                num_vertices=5023, n_shape=cfg.n_shape,
                                n_exp=cfg.n_exp, num_faces=9976))
            R, lip = 224, 88
        import numpy as _np

        nkey = jax.random.PRNGKey(7)
        tower_dt = _jnp.bfloat16 if args.bf16 else _jnp.float32
        lip_net = LipReadingNet(dtype=tower_dt)
        emo_mod = EmotionRecognitionModule(n_expression=8, dtype=tower_dt)
        vemo = VideoEmotionClassifier(
            n_classes=8, feature_dim=32 if args.tiny else 128,
            num_layers=1, nhead=4 if args.tiny else 8, input_dim=2048,
            dtype=tower_dt)
        neural = NeuralLosses(
            renderer=FixedViewRenderer(_np.asarray(flame_assets.faces),
                                       image_size=R),
            lipread=LipReadingLoss(
                lip_net, lip_net.init(nkey, _jnp.zeros((1, 2, lip, lip, 1)))),
            lipread_weight=1.0,
            emonet=EmoNetLoss(emo_mod),
            emonet_variables=emo_mod.init(nkey, _jnp.zeros((1, R, R, 3))),
            emotion_weight=1.0,
            video_emotion=VideoEmotionLoss(
                vemo, vemo.init(nkey, _jnp.zeros((1, 4, 2048)))),
            video_emotion_weight=0.1,
        )
        print("train-emote --neural: perception towers are RANDOM-init "
              "(import real lipread/EmoNet checkpoints for product runs)",
              file=sys.stderr)
    head = EmoteTalkingHead(
        cfg, flame_assets=flame_assets,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    B, T = args.batch_size, args.frames - args.frames % cfg.flint.latent_frame_size

    if args.root:
        # real MEAD/EMOCA data root (data_loader.py:229-374 equivalent)
        from .data import MeadEmocaDataset
        from .data.train_batches import EmoteBatchBuilder, emote_batches

        ds = MeadEmocaDataset(root=args.root, seq_length=T)
        builder = EmoteBatchBuilder(
            ds, frames=T, n_exp=cfg.flint.n_exp, n_shape=cfg.n_shape)
        if len(builder) == 0:
            raise SystemExit(f"no usable MEAD clips under {args.root}")
        tr_b, va_b = builder.split(args.val_fraction)
        print(f"data root: {len(tr_b)} train / {len(va_b)} val clips")
        batches = lambda: emote_batches(tr_b, min(B, len(tr_b)),  # noqa: E731
                                        epochs=None)
        vB = min(B, len(va_b))
        val_batches = lambda: emote_batches(  # noqa: E731
            va_b, vB, shuffle=False, epochs=1)
        first = next(emote_batches(tr_b, min(B, len(tr_b)), epochs=1))
    else:
        rng = np.random.default_rng(0)

        def synth(rng):
            while True:
                yield {
                    "raw_audio": jnp.asarray(
                        rng.standard_normal((B, T, 640)).astype(np.float32)),
                    "expression": jnp.asarray(
                        np.eye(9, dtype=np.float32)[rng.integers(0, 9, B)]),
                    "intensity": jnp.asarray(
                        np.eye(3, dtype=np.float32)[rng.integers(0, 3, B)]),
                    "identity": jnp.asarray(
                        np.eye(32, dtype=np.float32)[rng.integers(0, 32, B)]),
                    "shape": jnp.zeros((B, cfg.n_shape)),
                    "gt_exp": jnp.asarray(
                        rng.standard_normal((B, T, cfg.flint.n_exp)).astype(np.float32) * 0.1),
                    "gt_jaw": jnp.asarray(
                        rng.standard_normal((B, T, 3)).astype(np.float32) * 0.05),
                }

        batches = lambda: synth(rng)  # noqa: E731
        # DISJOINT synthetic val stream (not the first training batch):
        # early stop / best-val must not be measured on training data
        import itertools

        val_cached = list(itertools.islice(
            synth(np.random.default_rng(99_991)), 2))
        val_batches = lambda: iter(val_cached)  # noqa: E731
        first = next(synth(np.random.default_rng(0)))

    cond = StyleCondition(first["expression"], first["intensity"],
                          first["identity"], first.get("shape"))
    params = head.init(jax.random.PRNGKey(0), first["raw_audio"], cond)
    stages = [
        EmoteStage(name="geometric", steps=args.steps, lr=args.lr),
        EmoteStage(name="disentangled", steps=args.steps, lr=args.lr / 2,
                   disentangle="condition_exchange",
                   use_neural=neural is not None),
    ]
    res = train_emote(head, params, batches, stages=stages, neural=neural,
                      val_batches=val_batches,
                      val_every=args.val_every, run_dir=args.run_dir,
                      early_stop_patience=args.early_stop_patience)
    print(f"done: {res['total_steps']} steps, best val {res['best_val']:.4f}")
    return 0


def _build_prior_corpus(args, cfg):
    """Corpus -> (batches, val_batches) for `train_prior`: the
    prepare_train_data bridge (frozen CLIP voxels + frozen EMOTE style
    targets; /root/reference/train_diffusion_prior.py:172-197,422-449)."""
    import jax
    import jax.numpy as jnp

    from .data.prior_corpus import (
        PriorCorpusFeaturizer,
        load_corpus_items,
        make_val_batches,
        prior_corpus_batches,
        split_items,
    )
    from .models.clip_text import ClipTextConfig, ClipTextModel
    from .models.conditioning import EmotionStyleEncoder
    from .pipeline.generate import load_tokenizer

    items = load_corpus_items(
        json_dir=args.json_dir, wav_dir=args.wav_dir, mead_root=args.root,
        captions_path=args.captions,
    )
    if not items:
        raise SystemExit("no (caption, condition) pairs found in the corpus")
    print(f"corpus: {len(items)} caption pairs")

    clip_cfg = ClipTextConfig.tiny() if args.tiny else ClipTextConfig()
    clip_model = ClipTextModel(clip_cfg)
    tokenizer = load_tokenizer(
        clip_cfg.vocab_size, clip_cfg.max_position_embeddings,
        require_real=bool(args.pipeline_checkpoint),
    )
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, clip_cfg.max_position_embeddings), jnp.int32)
    clip_params = clip_model.init(rng, dummy)
    if args.pipeline_checkpoint:
        from .infra.checkpoint import restore_checkpoint

        restored = restore_checkpoint(
            args.pipeline_checkpoint, target={"clip": clip_params}
        )
        clip_params = restored["clip"]
    else:
        print("train-prior: no --pipeline-checkpoint; the frozen CLIP tower "
              "is RANDOM-init (smoke semantics)", file=sys.stderr)

    n_shape = 8 if args.tiny else 300
    cond_dim = 9 + 3 + 32 + n_shape
    enc = EmotionStyleEncoder(cfg.clip_size)
    enc_params = enc.init(rng, jnp.zeros((1, cond_dim)))
    if args.emote_checkpoint:
        from .infra.checkpoint import restore_checkpoint

        restored = restore_checkpoint(
            args.emote_checkpoint,
            target={"params": {"params": {"style_encoder":
                                          enc_params["params"]}}},
        )
        enc_params = {"params": restored["params"]["params"]["style_encoder"]}
    else:
        print("train-prior: no --emote-checkpoint; the frozen style tower "
              "is RANDOM-init (smoke semantics)", file=sys.stderr)

    feat = PriorCorpusFeaturizer(
        clip_model=clip_model, clip_params=clip_params,
        style_encoder=enc, style_params=enc_params, tokenizer=tokenizer,
        shape_dim=n_shape,
    )
    val_fraction = args.val_fraction if cfg.val_every else 0.0
    train_items, val_items = split_items(items, val_fraction)
    if cfg.val_every and not val_items:
        raise SystemExit(
            f"val split is empty ({len(items)} items, "
            f"val_fraction={val_fraction}); lower --val-every to 0 or add data"
        )
    batches = prior_corpus_batches(
        train_items, feat, cfg.batch_size, cfg.total_steps
    )
    val_batches = (
        make_val_batches(val_items, feat, cfg.batch_size, cfg.val_steps)
        if cfg.val_every else None
    )
    print(f"split: {len(train_items)} train / {len(val_items)} val")
    return batches, val_batches


def cmd_train_prior(args) -> int:
    from .train.driver import PriorTrainingConfig, train_prior
    from .parallel import make_mesh

    tiny = getattr(args, "tiny", False)
    cfg = PriorTrainingConfig(
        total_steps=args.steps, batch_size=args.batch_size, max_lr=args.lr,
        val_every=args.val_every, val_steps=args.val_steps, resume=args.resume,
        **(dict(clip_size=32, in_dim=32, depth=2, heads=4, dim_head=8,
                brain_hidden=64) if tiny else {}),
    )
    mesh = None
    import jax

    if args.dp and len(jax.devices()) > 1:
        mesh = make_mesh(tp=1)

    batches = val_batches = None
    if args.json_dir or args.root:
        batches, val_batches = _build_prior_corpus(args, cfg)
    res = train_prior(cfg, batches=batches, val_batches=val_batches,
                      logdir=args.logdir, ckpt_dir=args.ckpt_dir, mesh=mesh)
    print("final:", res["metrics"])
    if res.get("val_history"):
        print(f"best val loss: {res['best_val_loss']:.4f} "
              f"(best={res['best_ckpt']}, last={res['last_ckpt']})")
    return 0

def cmd_train_flint(args) -> int:
    """FLINT motion-prior (VAE / VQ-VAE) training — the reference's
    MotionPrior training app (inferno L2lVqVae; EMOTE's stage-0 prior).
    Synthetic motion without a data root; real MEAD motion windows
    (denormalised exp+jaw) via --root."""
    import numpy as np

    from .models.flint import FlintConfig
    from .train.driver import train_flint_vae

    fcfg = (FlintConfig(feature_dim=32, bottleneck_dim=32, quant_factor=2,
                        nhead=4, intermediate_size=64, out_dim=9, n_exp=6)
            if args.tiny else FlintConfig())
    B = args.batch_size
    T = args.frames - args.frames % fcfg.latent_frame_size

    if args.root:
        from .data import MeadEmocaDataset
        from .data.train_batches import EmoteBatchBuilder, emote_batches

        ds = MeadEmocaDataset(root=args.root, seq_length=T)
        builder = EmoteBatchBuilder(ds, frames=T, n_exp=fcfg.n_exp,
                                    n_shape=8 if args.tiny else 300)
        if len(builder) == 0:
            raise SystemExit(f"no usable MEAD clips under {args.root}")
        print(f"data root: {len(builder)} clips")

        def batches():
            for b in emote_batches(builder, min(B, len(builder)),
                                   epochs=None):
                yield np.concatenate([b["gt_exp"], b["gt_jaw"]], axis=-1)
    else:
        rng = np.random.default_rng(args.seed)

        def batches():
            while True:
                yield rng.standard_normal(
                    (B, T, fcfg.out_dim)).astype(np.float32) * 0.1

    res = train_flint_vae(
        batches(), total_steps=args.steps, flint_cfg=fcfg, lr=args.lr,
        logdir=args.logdir, ckpt_dir=args.ckpt_dir,
        quantizer="vq" if args.vq else None,
    )
    print("final:", res["metrics"])
    return 0


def cmd_train_faceformer(args) -> int:
    """Stage-1 FaceFormer training loop (synthetic batches without a data
    root; MEAD/EMOCA root via --root)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from .core import FlameModel, synthetic_assets
    from .core.assets import default_assets_path, load_flame_assets
    from .models import FaceFormerCoeff, FaceFormerConfig
    from .train.faceformer_trainer import FaceFormerTrainer

    if args.tiny:
        cfg = FaceFormerConfig.tiny()
        assets = synthetic_assets(n_shape=8, n_exp=6)
        flame = FlameModel(assets, n_shape=8, n_exp=6)
    else:
        cfg = FaceFormerConfig()
        npz = args.flame_npz or default_assets_path()
        flame = None
        if npz:
            assets = load_flame_assets(npz, 100, 50)
            flame = FlameModel(assets, n_shape=100, n_exp=50)
    model = FaceFormerCoeff(cfg)
    render_loss = None  # set by --render-loss under --root

    rng = np.random.default_rng(args.seed)
    B, T = args.batch_size, args.seq_length

    def batch():
        out = {
            "audio": jnp.asarray(rng.standard_normal((B, T * 640)).astype(np.float32)),
            "coeff": jnp.asarray(rng.standard_normal((B, T, cfg.vertice_dim)).astype(np.float32) * 0.3),
        }
        if cfg.with_condition_merge:
            out["eye_embed"] = jnp.asarray(rng.standard_normal((B, T, cfg.eye_dim)).astype(np.float32))
            out["emo_embed"] = jnp.asarray(rng.standard_normal((B, T, cfg.emo_dim)).astype(np.float32))
            out["ref_coeff"] = jnp.asarray(rng.standard_normal((B, 1, cfg.vertice_dim)).astype(np.float32))
        return out

    if args.root:
        from .data import MeadEmocaDataset, batch_iterator
        from .data.train_batches import FaceFormerBatchBuilder, FanConditioner

        ds = MeadEmocaDataset(root=args.root, seq_length=T)
        builder = FaceFormerBatchBuilder(
            ds, frames=T, coeff_dim=cfg.vertice_dim,
            load_images=(cfg.with_condition_merge or args.render_loss
                         or args.emo_loss))
        if len(builder) == 0:
            raise SystemExit(f"no usable MEAD clips under {args.root}")
        batches = batch_iterator(
            builder, batch_size=min(B, len(builder)), epochs=None)

        conditioner = None
        if cfg.with_condition_merge:
            # in-loop FanEncoder conditioning over the decoded crops
            # (faceformer.py:334-373): eye embeds from raw frames, emo
            # embeds from lip-masked shuffled frames, ref style coeff
            from .models import FanEncoder, fan_encoder_params_from_torch

            fan = FanEncoder()
            if args.fan_checkpoint:
                import torch as _torch

                sd = _torch.load(args.fan_checkpoint, map_location="cpu",
                                 weights_only=False)
                if isinstance(sd, dict) and "state_dict" in sd:
                    sd = sd["state_dict"]
                fan_vars = fan_encoder_params_from_torch(sd)
            else:
                fan_vars = fan.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
                print("train-faceformer: no --fan-checkpoint; the frozen "
                      "FanEncoder is RANDOM-init (smoke semantics)",
                      file=sys.stderr)
            conditioner = FanConditioner(fan, fan_vars, seed=args.seed)

        render_loss = None
        if args.render_loss or args.emo_loss:
            # stage-1 PIRender render loss (faceformer.py:488-566): warp/
            # final perceptual terms on the upper face, random-init
            # generator/VGG without checkpoints (smoke semantics; real
            # weights via pirender_params_from_torch). --emo-loss rides the
            # same generator forward (compute_emo_loss, faceformer.py:
            # 440-470); without --render-loss the perceptual weight is 0.
            from .data.stats import CoeffStats
            from .models.pirender import FaceGenerator, PIRenderConfig
            from .train.perceptual import PerceptualLoss, Vgg19Features
            from .train.render_loss import PIRenderRenderLoss

            probe = builder[0]
            if "img" not in probe:
                raise SystemExit(
                    "--render-loss needs detection crops under the data "
                    "root (EMOCA detections/*.png); none found")
            img_hw = probe["img"].shape[1:3]
            if args.tiny:
                pir_cfg = PIRenderConfig.tiny()
                vgg = Vgg19Features(taps=("relu_1_1",))
                def mk_ploss():
                    return PerceptualLoss(
                        vgg, layers=("relu_1_1",), num_scales=1)
            else:
                pir_cfg = PIRenderConfig()
                vgg = Vgg19Features()
                mk_ploss = lambda: PerceptualLoss(vgg)  # noqa: E731
            gen = FaceGenerator(pir_cfg)
            # descriptor = exp(d-3) | rot3+jaw3 | cam3 (59-d at full size)
            descr_dim = cfg.vertice_dim + 6
            gvars = gen.init(jax.random.PRNGKey(2),
                             jnp.zeros((1, *img_hw, 3)),
                             jnp.zeros((1, 27, descr_dim)))
            vgg_params = vgg.init(
                jax.random.PRNGKey(3), jnp.zeros((1, *img_hw, 3)))["params"]
            emonet = emonet_vars = None
            if args.emo_loss:
                from .models.emoca import (
                    EmoNetLoss,
                    EmotionRecognitionModule,
                    emotion_module_params_from_torch,
                )

                emo_mod = EmotionRecognitionModule(n_expression=8)
                if args.emonet_checkpoint:
                    import torch as _torch

                    sd = _torch.load(args.emonet_checkpoint,
                                     map_location="cpu", weights_only=False)
                    if isinstance(sd, dict) and "state_dict" in sd:
                        sd = sd["state_dict"]
                    emonet_vars = emotion_module_params_from_torch(sd)
                else:
                    emonet_vars = emo_mod.init(
                        jax.random.PRNGKey(4), jnp.zeros((1, *img_hw, 3)))
                    print("train-faceformer: no --emonet-checkpoint; the "
                          "frozen EmoNet is RANDOM-init (smoke semantics)",
                          file=sys.stderr)
                emonet = EmoNetLoss(emo_mod)
            stats = ds.stats or CoeffStats.identity(59)
            render_loss = PIRenderRenderLoss(
                generator=gen, generator_params=gvars,
                perceptual_warp=mk_ploss(),
                perceptual_final=mk_ploss(),
                vgg_params=vgg_params,
                coeff_mean=jnp.asarray(stats.mean),
                coeff_std=jnp.asarray(stats.std),
                n_samples=2,
                emonet=emonet, emonet_vars=emonet_vars,
            )
            print("train-faceformer: --render-loss with RANDOM-init "
                  "PIRender/VGG towers (smoke semantics)", file=sys.stderr)

        def batch():  # noqa: F811 - data-backed override
            b = next(batches)
            out = {
                "audio": jnp.asarray(b["audio"]),
                "coeff": jnp.asarray(b["coeff"][..., : cfg.vertice_dim]),
            }
            if conditioner is not None or render_loss is not None:
                if "img" not in b or not hasattr(b["img"], "ndim"):
                    raise SystemExit(
                        "conditioning / render loss needs detection crops "
                        "under the data root (EMOCA detections/*.png)")
            if conditioner is not None:
                out.update(conditioner.condition(
                    np.asarray(b["img"]), np.asarray(b["coeff"])))
                out["ref_coeff"] = out["ref_coeff"][..., : cfg.vertice_dim]
            if render_loss is not None:
                out.update({
                    "pose": jnp.asarray(b["pose"]),
                    "cam": jnp.asarray(b["cam"]),
                    "img": jnp.asarray(b["img"]),
                    "ref_img": jnp.asarray(b.get("ref_img", b["img"])),
                })
            return out

    first = batch()
    params = model.init(
        jax.random.PRNGKey(0), first["audio"], first["coeff"],
        first.get("eye_embed"), first.get("emo_embed"), first.get("ref_coeff"),
    )
    tx = optax.adamw(args.lr)
    # synthetic tiny FLAME lacks the 68-point landmark embedding the lip/eye
    # losses index; geometric landmark losses need the real assets
    use_ldmk = flame is not None and not args.tiny
    trainer = FaceFormerTrainer(model=model, tx=tx,
                                flame=flame if use_ldmk else None,
                                coeff_mean=jnp.zeros(cfg.vertice_dim),
                                coeff_std=jnp.ones(cfg.vertice_dim),
                                render_loss_fn=render_loss,
                                render_weight=(0.015 if args.render_loss
                                               else 0.0))
    step = trainer.jitted_train_step(donate=True)
    opt = tx.init(params)
    import time as _t

    t0 = _t.time()
    for i in range(args.steps):
        params, opt, metrics = step(params, opt, batch(), jax.random.PRNGKey(i))
        if (i + 1) % 50 == 0:
            print(f"step {i+1}: " + " ".join(
                f"{k}={float(v):.4f}" for k, v in metrics.items()
            ) + f" ({(i+1)/(_t.time()-t0):.1f} it/s)")
    if args.ckpt_dir:
        from .infra.checkpoint import save_checkpoint

        save_checkpoint(args.ckpt_dir, {"params": params})
    print("final:", {k: float(v) for k, v in metrics.items()})
    return 0


def cmd_train_faceformer_vert(args) -> int:
    """Vertex-space FaceFormer training (VOCASET root or synthetic): the
    FaceFormer-original teacher-forced vertex MSE, plus the disentangle
    variant's cross-modal shuffle losses under --disentangle
    (/root/reference/models/faceformer_disentangle.py:648-717,
    dataset/voca_data_loader.py:38-111)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from .audio import Wav2Vec2Config
    from .models.faceformer_vert import (
        FaceFormerVert,
        FaceFormerVertConfig,
        FlameRegionSelector,
        disentangle_losses,
    )

    rng = np.random.default_rng(args.seed)
    B, T = args.batch_size, args.frames
    if (args.emo_cls or args.emo_cls_pretrain) and not args.mead_root:
        raise SystemExit(
            "--emo-cls / --emo-cls-pretrain need --mead-root "
            "(MEAD emotion labels)")

    flame = None
    mead_batches = None
    if args.mead_root:
        # disentangle-variant training source (faceformer_disentangle.py:
        # 648-697): MEAD EMOCA coeffs decoded to FLAME vertices in-graph
        from .core import FlameModel, synthetic_assets
        from .core.assets import default_assets_path, load_flame_assets
        from .data import MeadEmocaDataset, batch_iterator
        from .data.stats import CoeffStats
        from .data.train_batches import FaceFormerBatchBuilder

        if args.tiny:
            assets = synthetic_assets(n_shape=8, n_exp=6)
            flame = FlameModel(assets, n_shape=8, n_exp=6)
        else:
            npz = args.flame_npz or default_assets_path()
            if not npz:
                raise SystemExit("--mead-root needs FLAME assets "
                                 "(--flame-npz) at full size")
            assets = load_flame_assets(npz, 100, 50)
            flame = FlameModel(assets, n_shape=100, n_exp=50)
        ds = MeadEmocaDataset(root=args.mead_root, seq_length=T)
        coeff_dim = flame.n_exp + 3  # [exp, jaw]
        builder = FaceFormerBatchBuilder(
            ds, frames=T, coeff_dim=coeff_dim, load_images=False)
        if len(builder) == 0:
            raise SystemExit(f"no usable MEAD clips under {args.mead_root}")
        mead_batches = batch_iterator(
            builder, batch_size=min(B, len(builder)), epochs=None)
        B = min(B, len(builder))
        stats = ds.stats or CoeffStats.identity(59)
        coeff_mean = jnp.asarray(stats.mean)
        coeff_std = jnp.asarray(stats.std)
        template = flame.vertices_only(
            jnp.zeros((1, flame.n_shape)), jnp.zeros((1, flame.n_exp)),
            jnp.zeros((1, 6)),
        ).reshape(-1)
        vert_dim = int(template.shape[0])
        n_subj = 1  # the reference feeds zero one-hots here

        def batch():
            b = next(mead_batches)
            return (jnp.asarray(b["audio"]), jnp.asarray(b["coeff"]),
                    jnp.zeros((B, n_subj)), jnp.asarray(b["emo_idx"]))
    elif args.root:
        from .data.vocaset import VocasetDataset

        subjects = (args.train_subjects.split(",") if args.train_subjects
                    else None)
        if subjects is None:
            import os as _os

            wavs = sorted(_os.listdir(_os.path.join(args.root, "wav")))
            # vocaset names: <subject>_sentenceNN.wav
            subjects = sorted({w.rsplit("_sentence", 1)[0] for w in wavs
                               if "_sentence" in w})
            print(f"train-faceformer-vert: autodetected subjects {subjects}")
        ds = VocasetDataset(
            args.root, train_subjects=subjects,
            val_subjects=subjects[:1], test_subjects=subjects[:1],
            dataset_kind=args.dataset_kind, split="train",
        )
        if not ds.items:
            raise SystemExit(f"no usable VOCASET clips under {args.root}")
        vert_dim = ds.items[0].vertice.shape[1]
        template = jnp.asarray(ds.items[0].template)
        n_subj = len(ds.train_subjects)

        def batch():
            idxs = rng.integers(0, len(ds.items), size=B)
            audio = np.zeros((B, T * 640), np.float32)
            verts = np.zeros((B, T, vert_dim), np.float32)
            for j, k in enumerate(idxs):
                it = ds.items[k]
                L = it.vertice.shape[0]
                if L > T:
                    s = int(rng.integers(0, L - T + 1))
                    win = it.vertice[s : s + T]
                else:
                    s, win = 0, it.vertice
                a = it.audio[s * 640 : (s + win.shape[0]) * 640]
                audio[j, : a.shape[0]] = a
                verts[j, : win.shape[0]] = win
                if win.shape[0] < T:  # edge-pad short clips
                    verts[j, win.shape[0]:] = win[-1]
            one_hot = np.stack([ds.items[k].one_hot for k in idxs])
            return (jnp.asarray(audio), jnp.asarray(verts),
                    jnp.asarray(one_hot), jnp.zeros((B,), jnp.int32))
    else:
        vert_dim = 30 if args.tiny else 15069
        template = jnp.asarray(
            rng.standard_normal(vert_dim).astype(np.float32) * 0.01)
        n_subj = 2

        def batch():
            return (
                jnp.asarray(rng.standard_normal((B, T * 640)).astype(np.float32)),
                jnp.asarray(
                    rng.standard_normal((B, T, vert_dim)).astype(np.float32)
                    * 0.01),
                jnp.asarray(np.eye(n_subj, dtype=np.float32)[
                    rng.integers(0, n_subj, size=B)]),
                jnp.zeros((B,), jnp.int32),
            )

    cfg = FaceFormerVertConfig(
        vertice_dim=vert_dim,
        feature_dim=32 if args.tiny else 64,
        period=5 if args.tiny else 30,
        num_train_subjects=n_subj,
        wav2vec2=Wav2Vec2Config.tiny() if args.tiny else Wav2Vec2Config(),
    )
    model = FaceFormerVert(cfg, template=template)

    selector = None
    if args.disentangle:
        # region masks from FLAME assets when the real template matches,
        # else thresholded from the data template (FLAMESelector semantics)
        from .core.assets import default_assets_path, load_flame_assets

        npz = args.flame_npz or default_assets_path()
        if flame is not None and vert_dim == 15069:
            selector = FlameRegionSelector.from_assets(assets)
        elif npz and vert_dim == 15069:
            selector = FlameRegionSelector.from_assets(
                load_flame_assets(npz, 100, 50))
        else:
            v3 = np.asarray(template, np.float32).reshape(-1, 3)
            selector = FlameRegionSelector.from_template(
                v3, frontal_z=float(np.median(v3[:, 2])),
                face_y=float(np.quantile(v3[:, 1], 0.25)),
                mouth_y_max=float(np.median(v3[:, 1])),
                eye_y_min=float(np.median(v3[:, 1])),
                eye_y_max=float(np.quantile(v3[:, 1], 0.95)),
                eye_z=float(np.median(v3[:, 2])),
            )
            print("train-faceformer-vert: region masks thresholded from "
                  "the data template (no FLAME assets)", file=sys.stderr)

    if args.mead_root:
        from .models.faceformer_vert import convert_coeff2verts

        def to_verts(payload):  # (B, T, coeff_dim) normalised -> (B, T, V*3)
            flat = payload.reshape(-1, payload.shape[-1])
            return convert_coeff2verts(
                flame, flat, coeff_mean, coeff_std
            ).reshape(payload.shape[0], payload.shape[1], -1)
    else:
        def to_verts(payload):
            return payload

    emo_cls = None
    if args.emo_cls or args.emo_cls_pretrain:
        # frozen FAN + cls head over rendered predicted frames
        # (faceformer_disentangle.py:718-731); random-init without ckpts
        from .models import FanEncoder, fan_encoder_params_from_torch
        from .train.emo_cls import EmoClsHead, EmoClsLoss

        fan = FanEncoder()
        fan_size = 64 if args.tiny else 224
        if args.fan_checkpoint:
            import torch as _torch

            sd = _torch.load(args.fan_checkpoint, map_location="cpu",
                             weights_only=False)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            fan_vars = fan_encoder_params_from_torch(sd)
        else:
            fan_vars = fan.init(
                jax.random.PRNGKey(5), jnp.zeros((1, fan_size, fan_size, 3)))
            print("train-faceformer-vert: no --fan-checkpoint; the frozen "
                  "FAN/cls towers are RANDOM-init (smoke semantics)",
                  file=sys.stderr)
        head = EmoClsHead()
        head_vars = head.init(jax.random.PRNGKey(6), jnp.zeros((1, 512)))
        if args.head_checkpoint:
            from .infra.checkpoint import restore_checkpoint

            head_vars = restore_checkpoint(
                args.head_checkpoint, {"emo_cls_head": head_vars}
            )["emo_cls_head"]
        emo_cls = EmoClsLoss(
            faces=jnp.asarray(assets.faces), fan=fan, fan_vars=fan_vars,
            head=head, head_vars=head_vars,
            render_size=fan_size, fan_size=fan_size,
            stride=1 if args.emo_cls_pretrain else min(20, T),
        )

    if args.emo_cls_pretrain:
        # is_emonet_pretrain stage (faceformer_disentangle.py:484-512):
        # train ONLY the cls head on GT-vertex renders (all frames),
        # FAN features detached
        head_params = emo_cls.head_vars
        tx = optax.adam(args.lr)
        opt = tx.init(head_params)

        def pre_loss(hv, payload, emo_idx):
            return emo_cls(to_verts(payload), emo_idx, head_vars=hv)

        @jax.jit
        def pre_step(hv, opt, payload, emo_idx):
            loss, g = jax.value_and_grad(pre_loss)(hv, payload, emo_idx)
            upd, opt2 = tx.update(g, opt)
            return optax.apply_updates(hv, upd), opt2, loss

        for i in range(args.steps):
            _, payload, _, emo_idx = batch()
            head_params, opt, loss = pre_step(head_params, opt, payload,
                                              emo_idx)
            if (i + 1) % 50 == 0:
                print(f"pretrain step {i+1}: emo_cls={float(loss):.4f}")
        if args.ckpt_dir:
            from .infra.checkpoint import save_checkpoint

            save_checkpoint(args.ckpt_dir, {"emo_cls_head": head_params})
        print("final:", {"emo_cls": float(loss)})
        return 0

    audio0, payload0, oh0, _ = batch()
    emo0 = jnp.zeros((B, T, cfg.emo_dim))
    verts0 = to_verts(payload0)
    params = model.init(jax.random.PRNGKey(0), audio0, verts0, emo0, oh0)
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    def loss_fn(p, audio, payload, one_hot, emo, emo_idx, step_rng):
        verts = to_verts(payload)
        if args.disentangle:
            terms = disentangle_losses(
                model, p, audio, verts, emo, selector, step_rng)
        else:
            pred = model.apply(p, audio, verts, emo, one_hot)
            terms = {"verts": jnp.mean((pred - verts) ** 2)}
        if emo_cls is not None:
            # teacher-forced pred; XLA CSE folds the duplicate apply in
            # the disentangle case
            pred = model.apply(p, audio, verts, emo, one_hot)
            terms["emo_cls"] = 0.1 * emo_cls(pred, emo_idx)
        return sum(terms.values()), terms

    @jax.jit
    def step(params, opt, audio, payload, one_hot, emo, emo_idx, step_rng):
        (loss, terms), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, audio, payload, one_hot, emo, emo_idx, step_rng)
        upd, opt2 = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt2, loss, terms

    import time as _t

    t0 = _t.time()
    for i in range(args.steps):
        audio, payload, one_hot, emo_idx = batch()
        emo = jnp.asarray(
            rng.standard_normal((B, T, cfg.emo_dim)).astype(np.float32)
        ) if args.disentangle else emo0
        params, opt, loss, terms = step(
            params, opt, audio, payload, one_hot, emo, emo_idx,
            jax.random.PRNGKey(i))
        if (i + 1) % 50 == 0:
            print(f"step {i+1}: loss={float(loss):.5f} "
                  f"({(i+1)/(_t.time()-t0):.1f} it/s)")
    if args.ckpt_dir:
        from .infra.checkpoint import save_checkpoint

        save_checkpoint(args.ckpt_dir, {"params": params})
    print("final:", {k: float(v) for k, v in terms.items()})
    return 0


def cmd_convert_flame(args) -> int:
    import os as _os

    from .core.assets import convert_flame_pickle

    _os.makedirs(_os.path.dirname(_os.path.abspath(args.out)), exist_ok=True)
    out = convert_flame_pickle(
        args.pkl, args.out, args.lmk_embedding, args.mediapipe_lmk_embedding
    )
    print(f"wrote {out}")
    return 0


def cmd_diversity(args) -> int:
    """Style diversity (--is_cal_diversity equivalent): sample N style
    embeddings for the same instruction, report mean pairwise L2."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .train.eval_metrics import style_diversity

    pipe = _build_pipeline(args)
    embs = []
    for i in range(args.num_samples):
        embs.append(np.asarray(
            pipe.sample_style(args.text, jax.random.PRNGKey(args.seed + i))[0]
        ))
    score = float(style_diversity(jnp.asarray(np.stack(embs))))
    print(f"diversity over {args.num_samples} samples: {score:.4f}")
    return 0


def cmd_import_prior(args) -> int:
    """Reference diffusion-prior .pth (last/best) -> orbax checkpoint with
    {"brain", "prior"} variables ready for the pipeline."""
    import jax

    from .infra.checkpoint import import_prior_checkpoint, save_checkpoint

    variables = import_prior_checkpoint(args.pth)
    save_checkpoint(os.path.abspath(args.out), variables)
    n = sum(x.size for x in jax.tree.leaves(variables))
    print(f"imported {n:,} prior params -> {args.out}")
    # real prior weights need the REAL tokenizer; pull it from the user's
    # HF cache alongside the weights when the asset slot is still empty
    # (reference loads both together, diffusion_prior.py:36-44)
    from .text import find_tokenizer_assets

    if find_tokenizer_assets() is None:
        import os as _os
        from pathlib import Path as _Path

        from .text.clip_bpe import import_tokenizer_assets

        hf = _Path(_os.environ.get("HF_HOME",
                                   _Path.home() / ".cache" / "huggingface"))
        try:
            dest = import_tokenizer_assets(hf)
            print(f"vendored CLIP tokenizer from the HF cache -> {dest}")
        except (FileNotFoundError, ValueError):
            print("WARNING: no CLIP tokenizer vocab found. The imported "
                  "prior will REFUSE to run until you run "
                  "`import-clip --src <dir with vocab.json+merges.txt>`.",
                  file=sys.stderr)
    return 0


def cmd_import_clip(args) -> int:
    """Vendor the CLIP BPE vocab (vocab.json + merges.txt) into
    assets/clip_tokenizer/ with validation, so product entry points stop
    falling back to the hash tokenizer. ``--src`` may be the file pair's
    directory, an HF hub cache root, or any tree holding the pair."""
    from .text.clip_bpe import import_tokenizer_assets

    dest = import_tokenizer_assets(args.src, dest=args.dest)
    from .text import ClipBpeTokenizer

    tok = ClipBpeTokenizer.from_dir(dest)
    print(f"validated + vendored CLIP tokenizer ({tok.vocab_size} tokens) "
          f"-> {dest}")
    return 0


def cmd_import_emote(args) -> int:
    """EMOTE torch checkpoint -> orbax variables for EmoteTalkingHead
    (handles Lightning prefixes / squasher / FLINT nesting variants)."""
    import jax

    from .infra.checkpoint import load_torch_state_dict, save_checkpoint
    from .infra.emote_import import emote_params_from_torch
    from .models.emote import EmoteConfig

    sd = load_torch_state_dict(args.ckpt)
    if args.config:
        from .infra.config import load_config

        cfg = load_config(EmoteConfig, args.config)
    else:
        cfg = EmoteConfig.tiny() if args.tiny else EmoteConfig()
    variables = emote_params_from_torch(sd, cfg)
    save_checkpoint(os.path.abspath(args.out), variables)
    n = sum(x.size for x in jax.tree.leaves(variables))
    print(f"imported {n:,} EMOTE params -> {args.out}")
    return 0


def cmd_serve(args) -> int:
    """Serve the caption corpus through the micro-batching InferenceServer
    (the production counterpart of ``instruct``'s per-sample loop)."""
    from .data import CaptionDataset
    from .pipeline.server import InferenceServer, ServingConfig

    ds = CaptionDataset(args.json_dir, args.wav_dir)
    pipe = _build_pipeline(args)
    scfg = ServingConfig(
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
        batch_buckets=tuple(sorted({args.max_batch} | {
            b for b in (1, 2, 4, 8, 16, 32) if b <= args.max_batch})),
        length_buckets=tuple(args.length_buckets),
        return_vertices=args.save_video,  # meshes only when rendering
    )
    t0 = time.time()
    with InferenceServer(pipe, scfg) as server:
        if args.warmup:
            server.warmup()
            print(f"warmup: {time.time()-t0:.1f}s "
                  f"({len(scfg.batch_buckets)}x{len(scfg.length_buckets)} shapes)")
        futs = []
        t1 = time.time()
        for item in ds:
            for ci, caption in enumerate(item.captions):
                futs.append((f"{item.name}_cap{ci}",
                             server.submit(item.wav_path, caption,
                                           seed=args.seed)))
        audio_s = 0.0
        for name, fut in futs:
            out = fut.result()
            audio_s += out["exp"].shape[0] / 25.0
            _save_outputs(out, args.out, name, pipe, args)
        wall = time.time() - t1
        pct = server.latency_percentiles()
        occ = server.stats["batch_size"]
        print(
            f"served {len(futs)} requests ({audio_s:.1f}s audio) in {wall:.2f}s "
            f"({audio_s / wall:.1f}x realtime); latency p50 {pct['p50']:.0f}ms "
            f"p99 {pct['p99']:.0f}ms; mean batch {sum(occ)/len(occ):.1f}"
        )
    return 0


def cmd_translate_captions(args) -> int:
    """Style-B (CelebV-Text prose) -> Style-A (MEAD instruction) captions,
    offline (scripts/style_celebv2meadtext.py equivalent)."""
    from .data.caption_translate import (
        build_translation_prompt,
        translate_style_b_to_a,
    )

    with open(args.input) as f:
        if args.input.endswith(".json"):
            data = json.load(f)
            sentences = data if isinstance(data, list) else data["captions"]
        else:
            sentences = [ln.strip() for ln in f if ln.strip()]
    if args.emit_prompt:
        print(build_translation_prompt(sentences))
        return 0
    outs = [translate_style_b_to_a(s, seed=args.seed) for s in sentences]
    if args.out:
        with open(args.out, "w") as f:
            json.dump(outs, f, indent=1)
        print(f"wrote {len(outs)} captions -> {args.out}")
    else:
        for s in outs:
            print(s)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="avi-talking-tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--tiny", action="store_true", help="tiny test config")
        sp.add_argument("--bf16", action="store_true", help="bfloat16 compute")
        sp.add_argument("--flame-npz", default=None)
        sp.add_argument("--checkpoint", default=None)
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--cond-scale", type=float, default=1.0)
        sp.add_argument("--out", default="outputs")
        sp.add_argument("--save-video", action="store_true")
        sp.add_argument("--image-size", type=int, default=256)

    g = sub.add_parser("generate", help="single wav + instruction")
    g.add_argument("--wav", required=True)
    g.add_argument("--text", required=True)
    common(g)
    g.set_defaults(fn=cmd_generate)

    i = sub.add_parser("instruct", help="caption-corpus batch inference")
    i.add_argument("--json-dir", required=True)
    i.add_argument("--wav-dir", default=None)
    common(i)
    i.set_defaults(fn=cmd_instruct)

    pt = sub.add_parser(
        "portrait",
        help="PIRender photoreal portrait video from generated coeffs")
    pt.add_argument("--source", required=True,
                    help="source portrait PNG (identity to reenact)")
    pt.add_argument("--coeffs", default=None,
                    help="coeff npz from `generate` (exp, jaw)")
    pt.add_argument("--net-g", default=None,
                    help="PIRender net_G torch checkpoint (.pt)")
    pt.add_argument("--wav", default=None, help="audio to mux into the video")
    pt.add_argument("--cam", type=float, nargs=3, default=(0.0, 0.0, 0.0),
                    help="fixed camera semantic (3 floats)")
    pt.add_argument("--chunk", type=int, default=32,
                    help="frames per jitted net_G dispatch")
    pt.add_argument("--save-warp", action="store_true",
                    help="write a warp|fake strip instead of fake only")
    pt.add_argument("--control", action="store_true",
                    help="render a semantic control sweep instead of coeffs")
    pt.add_argument("--control-steps", type=int, default=10)
    pt.add_argument("--control-exp-dims", type=int, default=50)
    common(pt)
    pt.set_defaults(fn=cmd_portrait)

    b = sub.add_parser("bench", help="single-chip RTF benchmark")
    b.set_defaults(fn=cmd_bench)

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

    dv = sub.add_parser("diversity", help="style diversity score (N samples)")
    dv.add_argument("--text", required=True)
    dv.add_argument("--num-samples", type=int, default=10)
    common(dv)
    dv.set_defaults(fn=cmd_diversity)

    tl = sub.add_parser("train-flint",
                        help="FLINT motion-prior (VAE/VQ) training")
    tl.add_argument("--steps", type=int, default=200)
    tl.add_argument("--batch-size", type=int, default=32)
    tl.add_argument("--frames", type=int, default=64)
    tl.add_argument("--lr", type=float, default=1e-4)
    tl.add_argument("--root", default=None, help="MEAD/EMOCA data root")
    tl.add_argument("--vq", action="store_true", help="VQ-VAE mode")
    tl.add_argument("--logdir", default=None)
    tl.add_argument("--ckpt-dir", default=None)
    common(tl)
    tl.set_defaults(fn=cmd_train_flint)

    tf = sub.add_parser("train-faceformer", help="stage-1 FaceFormer training")
    tf.add_argument("--steps", type=int, default=200)
    tf.add_argument("--batch-size", type=int, default=16)
    tf.add_argument("--seq-length", type=int, default=25)
    tf.add_argument("--lr", type=float, default=1e-4)
    tf.add_argument("--root", default=None, help="MEAD/EMOCA data root")
    tf.add_argument("--fan-checkpoint", default=None,
                    help="torch FanEncoder ckpt for the frozen conditioning "
                         "tower (random-init without it)")
    tf.add_argument("--render-loss", action="store_true",
                    help="enable the PIRender upper-face render loss "
                         "(needs --root with detection crops)")
    tf.add_argument("--emo-loss", action="store_true",
                    help="enable the EmoNet feature loss on the PIRender "
                         "renders (needs --root with detection crops)")
    tf.add_argument("--emonet-checkpoint", default=None,
                    help="torch EmotionRecognition ckpt for the frozen "
                         "EmoNet tower (random-init without it)")
    tf.add_argument("--ckpt-dir", default=None)
    common(tf)
    tf.set_defaults(fn=cmd_train_faceformer)

    tv = sub.add_parser("train-faceformer-vert",
                        help="vertex-space FaceFormer training (VOCASET)")
    tv.add_argument("--steps", type=int, default=200)
    tv.add_argument("--batch-size", type=int, default=4)
    tv.add_argument("--frames", type=int, default=100)
    tv.add_argument("--lr", type=float, default=1e-4)
    tv.add_argument("--root", default=None,
                    help="VOCASET-style root (wav/ + vertices_npy/ + "
                         "templates.pkl)")
    tv.add_argument("--train-subjects", default=None,
                    help="comma-separated subject names (default: autodetect)")
    tv.add_argument("--dataset-kind", default="vocaset",
                    choices=("vocaset", "BIWI"))
    tv.add_argument("--disentangle", action="store_true",
                    help="cross-modal shuffle losses (eye/mouth region MSE)")
    tv.add_argument("--mead-root", default=None,
                    help="MEAD/EMOCA root: coeffs decoded to FLAME verts "
                         "in-graph (the disentangle variant's data source)")
    tv.add_argument("--emo-cls", action="store_true",
                    help="emotion CE on rendered predicted frames via the "
                         "frozen FAN tower (needs --mead-root)")
    tv.add_argument("--emo-cls-pretrain", action="store_true",
                    help="pretrain ONLY the emo-cls head on GT renders "
                         "(is_emonet_pretrain stage; needs --mead-root)")
    tv.add_argument("--head-checkpoint", default=None,
                    help="orbax ckpt dir with a pretrained emo_cls_head")
    tv.add_argument("--fan-checkpoint", default=None,
                    help="torch FanEncoder ckpt for the frozen emo-cls "
                         "tower (random-init without it)")
    tv.add_argument("--ckpt-dir", default=None)
    common(tv)
    tv.set_defaults(fn=cmd_train_faceformer_vert)

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

    te = sub.add_parser("train-emote", help="staged EMOTE training loop")
    te.add_argument("--steps", type=int, default=200, help="steps per stage")
    te.add_argument("--batch-size", type=int, default=8)
    te.add_argument("--frames", type=int, default=64)
    te.add_argument("--lr", type=float, default=1e-4)
    te.add_argument("--val-every", type=int, default=50)
    te.add_argument("--early-stop-patience", type=int, default=0)
    te.add_argument("--run-dir", default=None)
    te.add_argument("--tiny", action="store_true")
    te.add_argument("--root", default=None,
                    help="EMOCA-preprocessed MEAD root; without it the loop "
                         "runs on synthetic batches")
    te.add_argument("--val-fraction", type=float, default=0.1,
                    help="held-out clip fraction of --root")
    te.add_argument("--neural", action="store_true",
                    help="enable the perceptual stage losses (render + "
                         "lipread/EmoNet/video-emotion towers in-graph); "
                         "gt meshes are decoded in-loss from the coeffs")
    te.add_argument("--bf16", action="store_true",
                    help="bfloat16 compute for the head and the frozen "
                         "perception towers (fp32 params; the measured "
                         "TPU training posture — see CLAUDE.md)")
    te.set_defaults(fn=cmd_train_emote)

    t = sub.add_parser("train-prior", help="diffusion prior training loop")
    t.add_argument("--steps", type=int, default=500)
    t.add_argument("--batch-size", type=int, default=256)
    t.add_argument("--lr", type=float, default=1e-4)
    t.add_argument("--logdir", default=None)
    t.add_argument("--ckpt-dir", default=None)
    t.add_argument("--dp", action="store_true", help="shard batch over devices")
    t.add_argument("--val-every", type=int, default=0,
                   help="validate every N steps; tags best/last ckpts")
    t.add_argument("--val-steps", type=int, default=4)
    t.add_argument("--resume", action="store_true",
                   help="restore <ckpt-dir>/last before training")
    # real-corpus bridge (prepare_train_data equivalent); without any of
    # these the loop runs on structured synthetic batches
    t.add_argument("--json-dir", default=None,
                   help="fixture caption corpus (experiments/json_dir layout)")
    t.add_argument("--wav-dir", default=None)
    t.add_argument("--root", default=None,
                   help="EMOCA-preprocessed MEAD root (clip-name captions)")
    t.add_argument("--captions", default=None,
                   help="clip-name -> caption(s) JSON for --root")
    t.add_argument("--pipeline-checkpoint", default=None,
                   help="orbax dir with {'clip': ...} params (frozen tower)")
    t.add_argument("--emote-checkpoint", default=None,
                   help="train-emote orbax ckpt; frozen style encoder source")
    t.add_argument("--val-fraction", type=float, default=0.1,
                   help="identity-stable held-out fraction of the corpus")
    t.add_argument("--tiny", action="store_true",
                   help="test-sized CLIP/prior dims")
    t.set_defaults(fn=cmd_train_prior)

    sv = sub.add_parser("serve", help="micro-batched serving over a corpus")
    sv.add_argument("--json-dir", required=True)
    sv.add_argument("--wav-dir", default=None)
    sv.add_argument("--max-batch", type=int, default=8)
    sv.add_argument("--max-wait-ms", type=float, default=5.0)
    sv.add_argument("--length-buckets", type=int, nargs="+",
                    default=[64, 128, 256, 512])
    sv.add_argument("--warmup", action="store_true")
    common(sv)
    sv.set_defaults(fn=cmd_serve)

    ip = sub.add_parser("import-prior", help="reference prior .pth -> orbax")
    ip.add_argument("--pth", required=True)
    ip.add_argument("--out", default="checkpoints/prior")
    ip.set_defaults(fn=cmd_import_prior)

    ic = sub.add_parser(
        "import-clip",
        help="vendor + validate the CLIP BPE vocab into assets/clip_tokenizer")
    ic.add_argument("--src", required=True,
                    help="dir with vocab.json+merges.txt, or an HF cache root")
    ic.add_argument("--dest", default=None,
                    help="target dir (default: repo assets/clip_tokenizer)")
    ic.set_defaults(fn=cmd_import_clip)

    ie = sub.add_parser("import-emote", help="EMOTE torch ckpt -> orbax")
    ie.add_argument("--ckpt", required=True)
    ie.add_argument("--out", default="checkpoints/emote")
    ie.add_argument("--tiny", action="store_true")
    ie.add_argument("--config", default=None,
                    help="EmoteConfig JSON matching the ckpt layout")
    ie.set_defaults(fn=cmd_import_emote)

    tc = sub.add_parser("translate-captions",
                        help="Style-B prose -> Style-A instructions (offline)")
    tc.add_argument("--input", required=True, help=".json list or .txt lines")
    tc.add_argument("--out", default=None)
    tc.add_argument("--seed", type=int, default=0)
    tc.add_argument("--emit-prompt", action="store_true",
                    help="print the LLM translation prompt instead")
    tc.set_defaults(fn=cmd_translate_captions)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
