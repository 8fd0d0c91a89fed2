"""Checkpoint/asset importers + offline caption translation."""

from __future__ import annotations

import json
import os
import sys


def _discover_tokenizer():
    """Locate a usable tokenizer vocab for freshly-imported real prior
    weights: the normal discovery chain first, then a one-shot vendoring of
    any CLIP snapshot in the user's HF cache (reference loads weights and
    tokenizer together, models/diffusion_prior.py:36-44). Returns the vocab
    dir or None."""
    from pathlib import Path

    from ..text import find_tokenizer_assets
    from ..text.clip_bpe import import_tokenizer_assets

    found = find_tokenizer_assets()
    if found is not None:
        return found
    hf = Path(os.environ.get("HF_HOME",
                             Path.home() / ".cache" / "huggingface"))
    try:
        dest = import_tokenizer_assets(hf)
        print(f"vendored CLIP tokenizer from the HF cache -> {dest}")
        return dest
    except (FileNotFoundError, ValueError):
        return None


def cmd_import_prior(args) -> int:
    """Reference diffusion-prior .pth (last/best) -> orbax checkpoint with
    {"brain", "prior"} variables ready for the pipeline."""
    import jax

    from ..infra.checkpoint import import_prior_checkpoint, save_checkpoint

    variables = import_prior_checkpoint(args.pth)
    save_checkpoint(os.path.abspath(args.out), variables)
    n = sum(x.size for x in jax.tree.leaves(variables))
    print(f"imported {n:,} prior params -> {args.out}")
    if _discover_tokenizer() is None:
        # error, not warning: real prior weights + a non-CLIP tokenizer
        # produce garbage ids (reference loads both together,
        # models/diffusion_prior.py:36-44)
        raise SystemExit(
            "import-prior: real prior weights imported but no CLIP "
            "tokenizer vocab found. Run `import-clip --src <dir with "
            "vocab.json+merges.txt>` first (the orbax checkpoint was "
            "written; it will refuse to serve until the vocab exists).")
    return 0


def cmd_import_clip(args) -> int:
    """Vendor the CLIP BPE vocab (vocab.json + merges.txt) into
    assets/clip_tokenizer/ with validation, so product entry points stop
    falling back to the hash tokenizer. ``--src`` may be the file pair's
    directory, an HF hub cache root, or any tree holding the pair."""
    from ..text.clip_bpe import import_tokenizer_assets

    dest = import_tokenizer_assets(args.src, dest=args.dest)
    from ..text import ClipBpeTokenizer

    tok = ClipBpeTokenizer.from_dir(dest)
    print(f"validated + vendored CLIP tokenizer ({tok.vocab_size} tokens) "
          f"-> {dest}")
    return 0


def cmd_import_emote(args) -> int:
    """EMOTE torch checkpoint -> orbax variables for EmoteTalkingHead
    (handles Lightning prefixes / squasher / FLINT nesting variants)."""
    import jax

    from ..infra.checkpoint import load_torch_state_dict, save_checkpoint
    from ..infra.emote_import import emote_params_from_torch
    from ..models.emote import EmoteConfig

    sd = load_torch_state_dict(args.ckpt)
    if args.config:
        from ..infra.config import load_config

        cfg = load_config(EmoteConfig, args.config)
    else:
        cfg = EmoteConfig.tiny() if args.tiny else EmoteConfig()
    variables = emote_params_from_torch(sd, cfg)
    save_checkpoint(os.path.abspath(args.out), variables)
    n = sum(x.size for x in jax.tree.leaves(variables))
    print(f"imported {n:,} EMOTE params -> {args.out}")
    return 0


def cmd_translate_captions(args) -> int:
    """Style-B (CelebV-Text prose) -> Style-A (MEAD instruction) captions,
    offline (scripts/style_celebv2meadtext.py equivalent)."""
    from ..data.caption_translate import (
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


def register(sub, common):
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
