"""train-prior: the diffusion-prior training loop + corpus bridge."""

from __future__ import annotations

import sys


def _build_prior_corpus(args, cfg):
    """Corpus -> (batches, val_batches) for `train_prior`: the
    prepare_train_data bridge (frozen CLIP voxels + frozen EMOTE style
    targets; /root/reference/train_diffusion_prior.py:172-197,422-449)."""
    import jax
    import jax.numpy as jnp

    from ..data.prior_corpus import (
        PriorCorpusFeaturizer,
        load_corpus_items,
        make_val_batches,
        prior_corpus_batches,
        split_items,
    )
    from ..models.clip_text import ClipTextConfig, ClipTextModel
    from ..models.conditioning import EmotionStyleEncoder
    from ..pipeline.generate import load_tokenizer

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
        from ..infra.checkpoint import restore_checkpoint

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
        from ..infra.checkpoint import restore_checkpoint

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
    from ..train.driver import PriorTrainingConfig, train_prior
    from ..parallel import make_mesh

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


def register(sub, common):
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
