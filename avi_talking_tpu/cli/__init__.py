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
  screen-videos  CelebV-Text screening: expressive-clip selection +
             action intervals (celebv_screen_videos.py equivalent)

Checkpoints/assets are optional: without them the models run random-init
(compute-path smoke); pass --flame-npz / --checkpoint for real outputs.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    from . import (
        importers,
        reconstruct,
        run,
        screen_videos,
        train_emoca,
        train_emote,
        train_faceformer,
        train_faceformer_vert,
        train_pirender,
        train_prior,
    )
    from ._common import common_args

    p = argparse.ArgumentParser(prog="avi-talking-tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    for mod in (run, reconstruct, train_emote, train_prior, train_faceformer,
                train_faceformer_vert, train_emoca, train_pirender,
                importers, screen_videos):
        mod.register(sub, common_args)
    args = p.parse_args(argv)
    return args.fn(args)
