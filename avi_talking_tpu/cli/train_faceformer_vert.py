"""train-faceformer-vert: vertex-space FaceFormer training (VOCASET /
MEAD disentangle / emo-cls stages)."""

from __future__ import annotations

import sys


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

    from ..audio import Wav2Vec2Config
    from ..models.faceformer_vert import (
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
        from ..core import FlameModel, synthetic_assets
        from ..core.assets import default_assets_path, load_flame_assets
        from ..data import MeadEmocaDataset, batch_iterator
        from ..data.stats import CoeffStats
        from ..data.train_batches import FaceFormerBatchBuilder

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
        from ..data.vocaset import VocasetDataset

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
        from ..core.assets import default_assets_path, load_flame_assets

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
        from ..models.faceformer_vert import convert_coeff2verts

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
        from ..models import FanEncoder, fan_encoder_params_from_torch
        from ..train.emo_cls import EmoClsHead, EmoClsLoss

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
            from ..infra.checkpoint import restore_checkpoint

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
            from ..infra.checkpoint import save_checkpoint

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
        from ..infra.checkpoint import save_checkpoint

        save_checkpoint(args.ckpt_dir, {"params": params})
    print("final:", {k: float(v) for k, v in terms.items()})
    return 0


def register(sub, common):
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
