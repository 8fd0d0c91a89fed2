"""Raw video frames -> pseudo-GT folders -> EMOCA fine-tune, end to end.

The full in-framework data-prep + training chain (the reference needs
face_alignment + face-parsing.PyTorch + inferno's MEADDataModule for the
same flow):

  1. face detection + 68-pt landmarks (S3FD + FAN, random-init here; pass
     real checkpoints via the CLI flags for real outputs),
  2. warp-crop the face box to the encoder size,
  3. BiSeNet photometric masks,
  4. frozen-EmocaEncoder pseudo-GT codes (validity-weighted shape average),
  5. one EMOCA self-supervised training step on the produced folders.

Runs on CPU with synthetic frames out of the box:

    python examples/preprocess_train.py
"""

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main() -> None:
    import jax

    # default to CPU: querying the backend first (jax.default_backend())
    # would INITIALIZE the axon TPU platform, which hangs forever when the
    # tunnel is down (CLAUDE.md gotchas). Opt into TPU explicitly.
    if os.environ.get("AVI_EXAMPLE_TPU") != "1":
        jax.config.update("jax_platforms", "cpu")

    from avi_talking_tpu.cli import main as cli
    from avi_talking_tpu.viz.pngio import write_png

    root = tempfile.mkdtemp(prefix="avi_raw_")
    src = os.path.join(root, "src", "clip001")
    os.makedirs(src)
    rng = np.random.default_rng(0)
    for t in range(6):  # stand-in for extracted video frames
        write_png(os.path.join(src, f"{t:04d}.png"),
                  (rng.uniform(0, 1, (96, 96, 3)) * 255).astype(np.uint8))

    out = os.path.join(root, "mead_root")
    # real runs: add --checkpoint emoca.ckpt --fan-ckpt 2DFAN4.pth
    #            --sfd-ckpt s3fd.pth --bisenet-ckpt 79999_iter.pth
    assert cli(["preprocess-mead", "--src", os.path.join(root, "src"),
                "--out", out, "--tiny", "--size", "48", "--max-b", "4",
                "--fan-detect", "--full-frames", "--parse-faces"]) == 0
    clip = os.path.join(out, "clip001")
    print("produced:", sorted(os.listdir(clip)))

    assert cli(["train-emoca", "--tiny", "--size", "32", "--batch-size", "2",
                "--steps", "2", "--log-every", "1", "--root", clip]) == 0
    print("OK: raw frames -> folders -> train-emoca step, all in-framework")


if __name__ == "__main__":
    main()
