"""train-emoca: EMOCA/DECA coarse self-supervised training over an image
folder (the reference's EMOCA training stage — gdl/models/DECA.py
_compute_loss coarse branch; see train.emoca_trainer)."""

from __future__ import annotations

import os
import sys


def cmd_train_emoca(args) -> int:
    import glob

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..core import FlameModel, synthetic_assets
    from ..core.assets import default_assets_path, load_flame_assets
    from ..core.flame import FlameTex
    from ..models.emoca import EmocaEncoder
    from ..train.deca_losses import DecaLossWeights
    from ..train.emoca_trainer import EmocaTrainer, train_emoca

    S = args.size
    if args.tiny:
        assets = synthetic_assets(n_shape=8, n_exp=6, n_static_landmarks=51)
        flame = FlameModel(assets, n_shape=8, n_exp=6)
    else:
        npz = args.flame_npz or default_assets_path()
        if not npz:
            raise SystemExit("train-emoca needs FLAME assets (--flame-npz)")
        assets = load_flame_assets(npz, 100, 50)
        flame = FlameModel(assets, n_shape=100, n_exp=50)

    # UVs: head_template.obj when given, planar projection otherwise
    if args.uv_obj:
        from ..viz.meshio import read_obj

        mesh = read_obj(args.uv_obj)
        uv_coords = jnp.asarray(mesh.uvs)
        uv_faces = jnp.asarray(mesh.face_uvs if mesh.face_uvs is not None
                               else mesh.faces)
    else:
        t = np.asarray(assets.v_template)
        span = t.max(0) - t.min(0) + 1e-6
        uv_coords = jnp.asarray(((t - t.min(0)) / span)[:, :2])
        uv_faces = assets.faces

    ftex = (FlameTex.from_npz(args.tex_npz) if args.tex_npz else None)
    if ftex is None:
        print("train-emoca: no --tex-npz; flat grey albedo (albedo "
              "regularizers become near-no-ops)", file=sys.stderr)

    if not args.detail:
        enc = EmocaEncoder(n_exp=flame.n_exp)
        variables = enc.init(jax.random.PRNGKey(args.seed),
                             jnp.zeros((1, S, S, 3)))
        if args.checkpoint:
            from ..infra.checkpoint import restore_checkpoint

            variables = restore_checkpoint(args.checkpoint, target=variables)

    B = args.batch_size
    if args.root:
        from ..viz.pngio import read_image_normalized

        if os.path.isdir(os.path.join(args.root, "EMOCA_v2_lr_mse_20")):
            # an EMOCA-preprocessed clip dir (preprocess-mead output):
            # detections crops + the exported pseudo landmarks
            paths = sorted(glob.glob(
                os.path.join(args.root, "detections", "*.png")))
        else:
            paths = sorted(glob.glob(os.path.join(args.root, "*.png")))
        if not paths:
            raise SystemExit(f"no PNG frames under {args.root}")
        lmk_path = args.lmk_npy or os.path.join(args.root, "landmarks.npy")
        lmk = None
        if os.path.exists(lmk_path):
            lmk = np.load(lmk_path).astype(np.float32)  # (N, 68, 2), [-1,1]
            if lmk.shape[0] != len(paths):
                raise SystemExit(
                    f"landmarks ({lmk.shape[0]}) != frames ({len(paths)})")
        elif not args.detail:
            # the detail stage is supervised purely photometrically
            # (DECA.py:2033-2210) and never reads landmarks
            raise SystemExit(
                f"train-emoca needs 68-point landmarks ({lmk_path}); run a "
                "detector offline or export from the EMOCA folders")
        # segmentation masks (preprocess-mead --bisenet-ckpt output): the
        # reference's useSeg=True photometric path (DECA.py:504-505)
        mask_paths = [os.path.join(args.root, "masks",
                                   os.path.basename(p)) for p in paths]
        n_masks = sum(os.path.exists(m) for m in mask_paths)
        have_masks = n_masks == len(paths)
        if 0 < n_masks < len(paths):
            print(f"train-emoca: masks/ covers {n_masks}/{len(paths)} "
                  "frames — IGNORING masks, photometric loss falls back to "
                  "render alpha (re-run preprocess-mead --bisenet-ckpt for "
                  "full coverage)", file=sys.stderr)
        rng = np.random.default_rng(args.seed)

        def _decode(pths, idx):
            imgs = np.stack(
                [read_image_normalized(pths[j]) for j in idx]) * 0.5 + 0.5
            if imgs.shape[1] != S:
                imgs = np.asarray(jax.image.resize(
                    jnp.asarray(imgs), (len(idx), S, S, 3), "bilinear"))
            return imgs

        def _load(idx):
            # decode per batch (not the whole folder up front): bounds host
            # memory at batch size for realistic clip sets
            return _decode(paths, idx)

        def batches():
            while True:
                idx = rng.integers(0, len(paths), size=B)
                b = {"images": jnp.asarray(_load(idx))}
                if lmk is not None:
                    b["lmk"] = jnp.asarray(lmk[idx])
                if have_masks:
                    m = _decode(mask_paths, idx)[..., :1]  # (B, S, S, 1)
                    b["masks"] = jnp.asarray((m > 0.5).astype(np.float32))
                yield b
        print(f"data root: {len(paths)} frames (per-batch decode"
              f"{', seg masks' if have_masks else ''})")
    else:
        rng = np.random.default_rng(args.seed)
        print("train-emoca: no --root; synthetic image batches (smoke)",
              file=sys.stderr)

        def batches():
            while True:
                yield {
                    "images": jnp.asarray(rng.uniform(
                        0, 1, (B, S, S, 3)).astype(np.float32)),
                    "lmk": jnp.asarray(rng.uniform(
                        -0.8, 0.8, (B, 68, 2)).astype(np.float32)),
                }

    if args.detail:
        # DETAIL stage: frozen coarse pipeline; E_detail + D_detail train
        # (train.emoca_trainer.DecaDetailTrainer)
        import optax

        from ..models.deca_detail import DecaDetailModel, DetailGenerator
        from ..models.emoca import EmocaEncoder as _Enc
        from ..train.emoca_trainer import DecaDetailTrainer

        n_detail = 4 if args.tiny else 128
        enc = _Enc(n_exp=flame.n_exp, with_detail=True, n_detail=n_detail)
        variables = enc.init(jax.random.PRNGKey(args.seed),
                             jnp.zeros((1, S, S, 3)))
        if args.checkpoint:
            from ..infra.checkpoint import restore_checkpoint

            try:
                variables = restore_checkpoint(args.checkpoint,
                                               target=variables)
            except Exception:
                # coarse-stage checkpoint (saved by train-emoca without
                # --detail: no detail tower in the tree) — graft it into
                # the fresh detail init. This IS the documented coarse ->
                # detail staging (DECA trains the detail stage on a frozen
                # pretrained coarse tower, DECA.py:2033).
                coarse = _Enc(n_exp=flame.n_exp)
                ctarget = coarse.init(jax.random.PRNGKey(args.seed),
                                      jnp.zeros((1, S, S, 3)))
                restored = restore_checkpoint(args.checkpoint,
                                              target=ctarget)
                variables = {
                    col: {**dict(variables[col]), **dict(restored[col])}
                    for col in variables}
                print("train-emoca --detail: grafted coarse checkpoint "
                      "into the detail-stage tree", file=sys.stderr)
        if args.exp_only or args.emo_loss or args.emonet_checkpoint:
            print("train-emoca --detail: --exp-only/--emo-loss/"
                  "--emonet-checkpoint are coarse-stage flags and are "
                  "IGNORED by the detail stage", file=sys.stderr)
        gen_d = DetailGenerator(latent_dim=3 + flame.n_exp + n_detail,
                                init_size=2 if args.tiny else 8)
        gvars = gen_d.init(jax.random.PRNGKey(args.seed + 1),
                           jnp.zeros((1, 3 + flame.n_exp + n_detail)))
        dm = DecaDetailModel(
            generator=gen_d, variables=gvars, faces=flame.assets.faces,
            uv_coords=uv_coords, uv_faces=uv_faces,
            uv_size=64 if args.tiny else 256)
        trainer = DecaDetailTrainer(
            encoder=enc, detail_model=dm, flame=flame, flame_tex=ftex,
            image_size=S)
        train_params = {"detail": variables["params"]["detail"],
                        "generator": gvars}
        tx = optax.adam(args.lr)
        opt = tx.init(train_params)
        step = trainer.jitted_train_step(tx, donate=False)
        it = batches()
        terms = {}
        for i in range(args.steps):
            train_params, opt, terms = step(train_params, opt, variables,
                                            next(it))
            if args.log_every and (i + 1) % args.log_every == 0:
                print(f"step {i + 1}: " + " ".join(
                    f"{k}={float(v):.4f}" for k, v in terms.items()))
        res = {"variables": {"encoder": variables,
                             "detail": train_params},
               "metrics": {k: float(v) for k, v in terms.items()}}
    else:
        emonet = emonet_vars = None
        if args.emo_loss:
            # EMOCA's emotion-consistency loss through a frozen EmoNet
            from ..models.emoca import EmoNetLoss, EmotionRecognitionModule

            emo_mod = EmotionRecognitionModule(n_expression=8)
            if args.emonet_checkpoint:
                import torch as _torch

                from ..models.emoca import emotion_module_params_from_torch

                sd = _torch.load(args.emonet_checkpoint, map_location="cpu",
                                 weights_only=False)
                if isinstance(sd, dict) and "state_dict" in sd:
                    sd = sd["state_dict"]
                emonet_vars = emotion_module_params_from_torch(sd)
            else:
                emonet_vars = emo_mod.init(jax.random.PRNGKey(9),
                                           jnp.zeros((1, S, S, 3)))
                print("train-emoca: no --emonet-checkpoint; the frozen "
                      "EmoNet is RANDOM-init (smoke semantics)",
                      file=sys.stderr)
            emonet = EmoNetLoss(emo_mod)
        trainer = EmocaTrainer(
            encoder=enc, flame=flame, uv_coords=uv_coords, uv_faces=uv_faces,
            flame_tex=ftex, image_size=S,
            weights=DecaLossWeights(emonet=1.0 if args.emo_loss else 0.0),
            train_exp_only=args.exp_only,
            emonet=emonet, emonet_variables=emonet_vars)
        res = train_emoca(trainer, variables, batches(), steps=args.steps,
                          lr=args.lr, log_every=args.log_every)
    if args.ckpt_dir:
        from ..infra.checkpoint import save_checkpoint

        save_checkpoint(args.ckpt_dir, res["variables"])
        print(f"saved encoder -> {args.ckpt_dir}")
    print("final:", {k: round(v, 5) for k, v in res["metrics"].items()})
    return 0


def cmd_preprocess_mead(args) -> int:
    """Raw frame folders -> EMOCA-preprocessed MEAD layout (the reference's
    MEADDataModule/EmocaPreprocessor offline pass; data.preprocess)."""
    import jax
    import jax.numpy as jnp

    from ..data.preprocess import EmocaPreprocessor, preprocess_clip_folder
    from ..models.emoca import EmocaEncoder

    S = args.size
    enc = EmocaEncoder(n_exp=6 if args.tiny else 50)
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)))
    if args.checkpoint:
        if os.path.isdir(args.checkpoint):
            from ..infra.checkpoint import restore_checkpoint

            variables = restore_checkpoint(args.checkpoint, target=variables)
        else:
            import torch as _torch

            from ..models.emoca import emoca_encoder_params_from_torch

            sd = _torch.load(args.checkpoint, map_location="cpu",
                             weights_only=False)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            pref = ""
            for cand in ("deca.", "model.", ""):
                if any(k.startswith(cand + "E_flame.") for k in sd):
                    pref = cand
                    break
            variables = emoca_encoder_params_from_torch(sd, prefix=pref)
    else:
        print("preprocess-mead: no --checkpoint; EMOCA encoder is "
              "RANDOM-init (smoke semantics — codes are meaningless)",
              file=sys.stderr)

    pre = EmocaPreprocessor(encoder=enc, variables=variables,
                            max_b=args.max_b)
    detector = None
    if args.fan_ckpt or args.fan_detect:
        from ..models.fan_landmarks import (
            FanLandmarkDetector, FanLandmarkNet,
            fan_landmarks_params_from_torch)

        fan_size = 256  # 2DFAN4's depth-4 hourglass needs 256px inputs
        if args.fan_ckpt:
            import torch as _torch

            fan = FanLandmarkNet()
            fan_vars = fan_landmarks_params_from_torch(
                _torch.load(args.fan_ckpt, map_location="cpu",
                            weights_only=False))
        else:
            print("preprocess-mead: --fan-detect without --fan-ckpt; FAN is "
                  "RANDOM-init (smoke semantics)", file=sys.stderr)
            fan = FanLandmarkNet(num_modules=1, depth=2, stem_features=8,
                                 features=16)
            fan_size = None  # tiny net accepts any /4 size; skip the resize
            fan_vars = fan.init(jax.random.PRNGKey(1),
                                jnp.zeros((1, S, S, 3)))
        detector = FanLandmarkDetector(fan, fan_vars, max_b=args.max_b,
                                       input_size=fan_size)
    if args.full_frames and detector is None:
        raise SystemExit("--full-frames needs --fan-ckpt or --fan-detect")
    parser = None
    if args.bisenet_ckpt or args.parse_faces:
        from ..models.bisenet import (
            BiSeNet, FaceParser, bisenet_params_from_torch)

        if args.bisenet_ckpt:
            import torch as _torch

            pvars = bisenet_params_from_torch(_torch.load(
                args.bisenet_ckpt, map_location="cpu", weights_only=False))
            psize = 512
        else:
            print("preprocess-mead: --parse-faces without --bisenet-ckpt; "
                  "BiSeNet is RANDOM-init (smoke semantics)",
                  file=sys.stderr)
            pvars = BiSeNet().init(jax.random.PRNGKey(2),
                                   jnp.zeros((1, 64, 64, 3)))
            psize = 64
        parser = FaceParser(pvars, size=psize, max_b=args.max_b)
    box_detector = None
    if args.sfd_ckpt:
        if not args.full_frames:
            raise SystemExit("--sfd-ckpt only applies with --full-frames")
        import torch as _torch

        from ..models.sfd import SfdDetector, sfd_params_from_torch

        box_detector = SfdDetector(
            sfd_params_from_torch(_torch.load(
                args.sfd_ckpt, map_location="cpu", weights_only=False)),
            threshold=args.sfd_threshold)
    flame = None
    if args.tiny or args.flame_npz:
        from ..core import FlameModel, synthetic_assets
        from ..core.assets import load_flame_assets

        if args.tiny:
            assets = synthetic_assets(n_shape=8, n_exp=6,
                                      n_static_landmarks=51)
            flame = FlameModel(assets, n_shape=8, n_exp=6)
        else:
            flame = FlameModel(load_flame_assets(args.flame_npz, 100, 50),
                               n_shape=100, n_exp=50)
    opts = dict(
        write_detections=not args.no_detections, flame=flame,
        detector=detector, crop_full_frames=args.full_frames,
        crop_size=S, crop_scale=args.crop_scale,
        crop_smooth_sigma=args.crop_smooth_sigma,
        box_detector=box_detector, parser=parser)
    if args.videos:
        from ..data.preprocess import preprocess_clip_video
        from ..data.videoio import have_ffmpeg

        if not have_ffmpeg():
            raise SystemExit(
                "preprocess-mead --videos: ffmpeg not found on PATH — "
                "video decode needs it; extract frames to PNG folders "
                "and re-run without --videos")
        exts = (".mp4", ".avi", ".mov", ".mkv", ".webm")
        clips = sorted(
            f for f in os.listdir(args.src)
            if f.lower().endswith(exts)
            and os.path.isfile(os.path.join(args.src, f)))
        runner = lambda clip: preprocess_clip_video(
            pre, os.path.join(args.src, clip), args.out,
            fps=args.fps if args.fps > 0 else None, **opts)
    else:
        clips = sorted(
            d for d in os.listdir(args.src)
            if os.path.isdir(os.path.join(args.src, d)))
        runner = lambda clip: preprocess_clip_folder(
            pre, os.path.join(args.src, clip), args.out, **opts)
    done = 0
    for clip in clips:
        out = runner(clip)
        if out:
            done += 1
            print(f"[{done}/{len(clips)}] {clip} -> {out}")
    print(f"preprocessed {done}/{len(clips)} clips -> {args.out}")
    return 0 if done else 1


def register(sub, common):
    pm = sub.add_parser(
        "preprocess-mead",
        help="raw frame folders -> EMOCA-preprocessed MEAD layout")
    pm.add_argument("--src", required=True,
                    help="root of <clip>/*.png (+ optional <clip>/*.wav, "
                         "validity.npy), or of video files with --videos")
    pm.add_argument("--out", required=True)
    pm.add_argument("--videos", action="store_true",
                    help="treat --src entries as VIDEO FILES (mp4/avi/...):"
                         " decode through an ffmpeg rawvideo pipe "
                         "(data.videoio), demux audio to 16 kHz wav; the "
                         "reference's skvideo FaceVideoDataModule path")
    pm.add_argument("--fps", type=float, default=25.0,
                    help="with --videos: resample to this frame rate "
                         "(reference trains at 25 fps); <=0 keeps source")
    pm.add_argument("--checkpoint", default=None,
                    help="EMOCA encoder weights: orbax dir or torch ckpt")
    pm.add_argument("--size", type=int, default=224)
    pm.add_argument("--max-b", type=int, default=32,
                    help="frames per jitted encoder dispatch")
    pm.add_argument("--no-detections", action="store_true",
                    help="skip writing detections/*.png crops")
    pm.add_argument("--flame-npz", default=None,
                    help="FLAME assets: also export pseudo landmarks.npy "
                         "per clip (train-emoca --root fine-tune source)")
    pm.add_argument("--fan-ckpt", default=None,
                    help="face_alignment 2DFAN4 torch weights: detect "
                         "landmarks + per-frame validity in-framework")
    pm.add_argument("--fan-detect", action="store_true",
                    help="run the FAN detector even without weights "
                         "(random-init smoke)")
    pm.add_argument("--full-frames", action="store_true",
                    help="source PNGs are FULL video frames: detect + "
                         "warp-crop the face box to --size before encoding "
                         "(requires --fan-ckpt or --fan-detect)")
    pm.add_argument("--crop-scale", type=float, default=1.25,
                    help="face-box scale for --full-frames (reference 1.25)")
    pm.add_argument("--crop-smooth-sigma", type=float, default=3.0,
                    help="gaussian smoothing of the face-box track over "
                         "time (reference sigma=3; 0 disables) — "
                         "interpolates over failed detections first")
    pm.add_argument("--sfd-ckpt", default=None,
                    help="S3FD torch weights: stage-1 face-box detection "
                         "before FAN (for frames where the face does not "
                         "dominate); requires --full-frames")
    pm.add_argument("--sfd-threshold", type=float, default=0.5,
                    help="S3FD keep threshold (reference filter_threshold)")
    pm.add_argument("--bisenet-ckpt", default=None,
                    help="face-parsing BiSeNet torch weights: write "
                         "photometric masks/ per clip (train-emoca useSeg)")
    pm.add_argument("--parse-faces", action="store_true",
                    help="run the face parser even without weights "
                         "(random-init smoke)")
    pm.add_argument("--tiny", action="store_true")
    pm.set_defaults(fn=cmd_preprocess_mead)

    tm = sub.add_parser(
        "train-emoca",
        help="EMOCA coarse self-supervised training over an image folder")
    tm.add_argument("--root", default=None,
                    help="folder of face PNGs + landmarks.npy (68pt, [-1,1])")
    tm.add_argument("--lmk-npy", default=None,
                    help="explicit landmarks npy path (default "
                         "<root>/landmarks.npy)")
    tm.add_argument("--steps", type=int, default=200)
    tm.add_argument("--batch-size", type=int, default=8)
    tm.add_argument("--size", type=int, default=224,
                    help="train image resolution")
    tm.add_argument("--lr", type=float, default=1e-4)
    tm.add_argument("--exp-only", action="store_true",
                    help="freeze the coarse tower; train only E_expression "
                         "(the EMOCA staging)")
    tm.add_argument("--detail", action="store_true",
                    help="DETAIL stage: train E_detail + D_detail with the "
                         "displacement losses (frozen coarse pipeline)")
    tm.add_argument("--emo-loss", action="store_true",
                    help="EMOCA emotion-consistency loss through a frozen "
                         "EmoNet (use_emonet_loss)")
    tm.add_argument("--emonet-checkpoint", default=None,
                    help="torch EmotionRecognition ckpt for the frozen "
                         "EmoNet tower (random-init without it)")
    tm.add_argument("--uv-obj", default=None,
                    help="head_template.obj for real FLAME UVs")
    tm.add_argument("--tex-npz", default=None,
                    help="FLAME texture npz (PCA albedo)")
    tm.add_argument("--tiny", action="store_true")
    tm.add_argument("--flame-npz", default=None)
    tm.add_argument("--checkpoint", default=None,
                    help="orbax EmocaEncoder variables to start from")
    tm.add_argument("--ckpt-dir", default=None)
    tm.add_argument("--seed", type=int, default=0)
    tm.add_argument("--log-every", type=int, default=50)
    tm.set_defaults(fn=cmd_train_emoca)
