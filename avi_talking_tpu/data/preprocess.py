"""Raw-video -> EMOCA-folder preprocessing (pseudo-GT extraction).

The in-framework equivalent of the reference's
inferno/models/temporal/Preprocessors.py:330-489 (EmocaPreprocessor) +
the MEAD/FaceVideoDataModule folder writers: run the frozen EmocaEncoder
over a clip's frames in chunks, zero the global rotation, average the shape
code over the clip weighted by landmark validity, and write the
``EMOCA_v2_lr_mse_20/<frame>_000/{exp,pose,shape,cam}.npy`` layout that
data.mead.MeadEmocaDataset consumes.

The encoder forward runs in jitted fixed-size chunks (max_b batching,
Preprocessors.py:381-405 — pad-to-chunk instead of a ragged tail so the
TPU executable is reused across clips).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import numpy as np


@dataclasses.dataclass
class EmocaPreprocessor:
    """Frozen-encoder pseudo-GT extractor."""

    encoder: object  # models.emoca.EmocaEncoder
    variables: Dict
    max_b: int = 32
    with_global_pose: bool = False
    average_shape_decode: bool = True
    crash_on_invalid: bool = True

    def __post_init__(self):
        import jax

        self._apply = jax.jit(
            lambda v, x: self.encoder.apply(v, x, train=False))

    def encode_frames(self, frames: np.ndarray) -> Dict[str, np.ndarray]:
        """(T, H, W, 3) images in [0, 1] -> per-frame code arrays.

        Chunked by ``max_b`` with tail padding so every dispatch reuses one
        compiled executable (the reference's max_b loop re-traces ragged
        tails; Preprocessors.py:381-405)."""
        import jax.numpy as jnp

        from .batching import chunked_apply

        return chunked_apply(
            lambda c: self._apply(self.variables, jnp.asarray(c)),
            frames, self.max_b)

    def pseudo_gt(
        self,
        frames: np.ndarray,  # (T, H, W, 3) in [0, 1]
        landmark_validity: Optional[np.ndarray] = None,  # (T,)
        codes: Optional[Dict[str, np.ndarray]] = None,  # precomputed encode
    ) -> Dict[str, np.ndarray]:
        """EmocaPreprocessor.forward semantics (Preprocessors.py:405-489):
        zero global pose, landmark-validity-weighted average shape. Pass
        ``codes`` (from ``encode_frames``) to avoid a second encoder pass."""
        codes = dict(self.encode_frames(frames) if codes is None else codes)
        T = frames.shape[0]
        if not self.with_global_pose:
            codes["pose"] = codes["pose"].copy()
            codes["pose"][:, :3] = 0.0
        if landmark_validity is None:
            w = np.full((T, 1), 1.0 / T, np.float32)
        else:
            s = landmark_validity.sum()
            if s <= 0 or not np.isfinite(s):
                msg = "landmark validity sums to zero/NaN"
                if self.crash_on_invalid:
                    raise ValueError(msg)
                print(f"[WARNING] {msg}; falling back to uniform weights")
                w = np.full((T, 1), 1.0 / T, np.float32)
            else:
                w = (landmark_validity / s).astype(np.float32)[:, None]
        avg_shape = (w * codes["shape"]).sum(axis=0)
        if self.average_shape_decode:
            codes["shape"] = np.broadcast_to(
                avg_shape[None], codes["shape"].shape).copy()
        return codes


def landmarks_from_codes(
    flame, codes: Dict[str, np.ndarray], chunk: int = 32
) -> np.ndarray:
    """Pseudo 2D landmarks from the encoded codes: FLAME 68-point decode +
    weak-perspective projection with the predicted cam (DECA.decode
    landmark path, gdl/models/DECA.py:970-973). (T, 68, 2) in [-1, 1] NDC —
    consistent with the encoder, so train-emoca can fine-tune on
    preprocess-mead output without an external detector."""
    import jax
    import jax.numpy as jnp

    from ..core.projection import batch_orth_proj

    @jax.jit
    def proj(shape, exp, pose, cam):
        _, lmk2d, _ = flame(shape[:, : flame.n_shape],
                            exp[:, : flame.n_exp], pose)
        p = batch_orth_proj(lmk2d, cam)[..., :2]
        return jnp.stack([p[..., 0], -p[..., 1]], axis=-1)

    T = codes["exp"].shape[0]
    outs = []
    for i in range(0, T, chunk):
        n = min(chunk, T - i)
        sl = slice(i, i + n)
        pad = chunk - n
        args = []
        for key in ("shape", "exp", "pose", "cam"):
            a = codes[key][sl]
            if pad:
                a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])
            args.append(jnp.asarray(a))
        outs.append(np.asarray(proj(*args))[:n])
    return np.concatenate(outs).astype(np.float32)


def write_emoca_folders(
    clip_dir: str,
    codes: Dict[str, np.ndarray],
    wav_src: Optional[str] = None,
    detections: Optional[np.ndarray] = None,  # (T, H, W, 3) in [0, 1]
) -> str:
    """Write the MEAD/EMOCA folder layout data.mead reads:
    <clip>/EMOCA_v2_lr_mse_20/<frame>_000/{exp,pose,shape,cam}.npy
    (+ <clip>/<clip>.wav, + detections/<frame>.png crops)."""
    frames_dir = os.path.join(clip_dir, "EMOCA_v2_lr_mse_20")
    os.makedirs(frames_dir, exist_ok=True)
    T = codes["exp"].shape[0]
    for t in range(T):
        fd = os.path.join(frames_dir, f"{t:05d}_000")
        os.makedirs(fd, exist_ok=True)
        for key in ("exp", "pose", "shape", "cam"):
            np.save(os.path.join(fd, f"{key}.npy"), codes[key][t])
    if wav_src and os.path.exists(wav_src):
        import shutil

        name = os.path.basename(clip_dir.rstrip("/"))
        shutil.copyfile(wav_src, os.path.join(clip_dir, name + ".wav"))
    if detections is not None:
        from ..viz.pngio import write_png

        det_dir = os.path.join(clip_dir, "detections")
        os.makedirs(det_dir, exist_ok=True)
        for t in range(T):
            write_png(
                os.path.join(det_dir, f"{t:05d}_000.png"),
                (np.clip(detections[t], 0, 1) * 255).astype(np.uint8))
    return clip_dir


def preprocess_clip_folder(
    pre: EmocaPreprocessor,
    src_dir: str,  # folder of PNG frames (+ optional <name>.wav, validity.npy)
    out_dir: str,
    write_detections: bool = True,
    flame=None,  # core.flame.FlameModel: also export landmarks.npy
    detector=None,  # models.fan_landmarks.FanLandmarkDetector
    crop_full_frames: bool = False,
    crop_size: int = 224,
    crop_scale: float = 1.25,
    crop_smooth_sigma: float = 0.0,  # reference uses gaussian sigma=3
    box_detector=None,  # models.sfd.SfdDetector (stage-1 face boxes)
    parser=None,  # models.bisenet.FaceParser (photometric seg masks)
) -> Optional[str]:
    """One raw clip folder -> one EMOCA-preprocessed clip folder.

    With ``detector`` (a FAN landmark detector), landmarks + per-frame
    validity are DETECTED in-framework — the reference's
    FaceDetector.landmarks_from_batch_no_face_detection path
    (inferno/utils/FaceDetector.py:128-145) — and the validity weights the
    shape average. Detected landmarks take precedence over the FLAME
    projection fallback (``flame``); an explicit validity.npy in the
    source folder takes precedence over detected scores.

    ``crop_full_frames`` additionally treats the source PNGs as FULL video
    frames: landmarks are detected on the full frame, the kpt68 box is
    warp-cropped to ``crop_size`` at ``crop_scale`` (FaceVideoDataModule's
    detect step, data.facecrop), and everything downstream (encode,
    detections/, landmarks.npy) runs on the crops.

    ``parser`` (a BiSeNet FaceParser) additionally writes per-frame
    photometric masks (masks/<frame>.png, the complement of the discarded
    face-parsing labels, IO.py:255-278) that ``cli train-emoca`` consumes
    as its useSeg-style batch masks."""
    import glob

    from ..viz.pngio import read_image_normalized

    paths = sorted(glob.glob(os.path.join(src_dir, "*.png")))
    if not paths:
        return None
    validity = None
    vp = os.path.join(src_dir, "validity.npy")
    if os.path.exists(vp):
        validity = np.load(vp).astype(np.float32)
    det_lmk = None
    if crop_full_frames:
        if detector is None:
            raise ValueError("crop_full_frames needs a landmark detector")
        from .facecrop import (
            bbox2point_kpt68,
            detect_fullframe_landmarks,
            landmarks_to_crop_space,
            smooth_track,
            warp_crop,
        )

        # two chunked passes over the clip: (1) detect the landmark track,
        # (2) warp-crop from the (optionally smoothed) box track. Full-res
        # frames live on host only one max_b chunk at a time (a 900-frame
        # 1080p clip would be ~22 GB decoded at once) and every device
        # dispatch reuses one (max_b, H, W) executable instead of
        # re-tracing per clip length.
        blk = pre.max_b

        def _chunks():
            for i in range(0, len(paths), blk):
                ps = paths[i : i + blk]
                n = len(ps)
                ps = ps + [ps[-1]] * (blk - n)
                yield n, np.stack(
                    [read_image_normalized(p) for p in ps]) * 0.5 + 0.5

        lmks, scs = [], []
        for n, full in _chunks():
            l, s = detect_fullframe_landmarks(detector, full,
                                              box_detector=box_detector)
            lmks.append(l[:n])
            scs.append(s[:n])
        lmk_px = np.concatenate(lmks)
        scores = np.concatenate(scs)
        det_val = np.clip(scores.mean(-1), 0.0, None).astype(np.float32)
        old_size, center = bbox2point_kpt68(lmk_px)
        size = (old_size * crop_scale).astype(np.float32)
        if crop_smooth_sigma > 0:
            center, size = smooth_track(center, size, validity=det_val,
                                        sigma=crop_smooth_sigma)
        crops = []
        for n, full in _chunks():
            i = sum(c.shape[0] for c in crops)
            cb, sb = center[i : i + blk], size[i : i + blk]
            if cb.shape[0] < blk:  # padded tail: repeat the last box
                pad = blk - cb.shape[0]
                cb = np.concatenate([cb, np.repeat(cb[-1:], pad, axis=0)])
                sb = np.concatenate([sb, np.repeat(sb[-1:], pad, axis=0)])
            crops.append(warp_crop(full, cb, sb, crop_size)[:n])
        frames = np.concatenate(crops).astype(np.float32)
        det_lmk = landmarks_to_crop_space(lmk_px, center, size, crop_size)
        if validity is None:
            s = det_val.sum()
            validity = det_val if np.isfinite(s) and s > 0 else None
    else:
        frames = np.stack(
            [read_image_normalized(p) for p in paths]) * 0.5 + 0.5
    if not crop_full_frames and detector is not None:
        det_lmk, det_scores = detector(frames)
        if validity is None:
            validity = np.clip(det_scores.mean(-1), 0.0, None)
            s = validity.sum()
            if not np.isfinite(s) or s <= 0:
                validity = None  # degenerate scores -> uniform weights
    raw = pre.encode_frames(frames)
    codes = pre.pseudo_gt(frames, validity, codes=raw)
    name = os.path.basename(src_dir.rstrip("/"))
    wavs = glob.glob(os.path.join(src_dir, "*.wav"))
    clip_dir = write_emoca_folders(
        os.path.join(out_dir, name), codes,
        wav_src=wavs[0] if wavs else None,
        detections=frames if write_detections else None)
    if parser is not None:
        from ..viz.pngio import write_png

        masks_dir = os.path.join(clip_dir, "masks")
        os.makedirs(masks_dir, exist_ok=True)
        _, mask = parser(frames)
        for t in range(mask.shape[0]):
            write_png(os.path.join(masks_dir, f"{t:05d}_000.png"),
                      (mask[t] * 255).astype(np.uint8))
    if det_lmk is not None:
        np.save(os.path.join(clip_dir, "landmarks.npy"), det_lmk)
        if validity is not None:
            np.save(os.path.join(clip_dir, "validity.npy"), validity)
    elif flame is not None:
        # project with the UNzeroed global rotation so the exported
        # landmarks lie on the face in the exported crops (the pseudo-GT
        # pose is frontalized, the images are not); shape stays the
        # validity-averaged code
        lmk = landmarks_from_codes(
            flame, {**codes, "pose": raw["pose"]}, chunk=pre.max_b)
        np.save(os.path.join(clip_dir, "landmarks.npy"), lmk)
    return clip_dir
