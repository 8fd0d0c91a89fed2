"""Ping-pong loop extension of short driving sequences.

Port of /root/reference/loop_utils.py: ``calc_loop_idx`` maps a target frame
index onto a forward/backward bounce over the source length, and
``loopback_frames`` gathers a length-``frame_num`` sequence from a shorter
clip (used to extend driving imagery for stage-1 prediction,
models/faceformer.py predict :669 via loopback_frames).
Vectorised (numpy or jnp arrays both work).
"""

from __future__ import annotations

import numpy as np


def calc_loop_idx(idx, loop_num: int):
    """Bounce index: 0,1,..,L-1,L-1,..,1,0,0,1,... (reference formula)."""
    idx = np.asarray(idx)
    flag = -1 * ((idx // loop_num % 2) * 2 - 1)
    new_idx = -flag * (flag - 1) // 2 + flag * (idx % loop_num)
    return (new_idx + loop_num) % loop_num


def loopback_frames(frames, frame_num: int):
    """(L, ...) -> (frame_num, ...) by ping-pong indexing along axis 0."""
    loop_num = frames.shape[0]
    idx = calc_loop_idx(np.arange(frame_num), loop_num)
    return frames[idx]
