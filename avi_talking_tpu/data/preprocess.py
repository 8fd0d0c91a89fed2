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
    """Frozen-encoder pseudo-GT extractor.

    ``transport`` picks how frames cross the host->device link — the hot
    wire on remote-TPU links (~35 MB/s measured through the axon tunnel,
    where a chunk of 32 fp32 crops costs ~550 ms of transfer for ~7 ms of
    encoder compute):
      - "auto"   — uint8 input ships as uint8 (4x fewer bytes than fp32,
                   normalised on device), float input ships as float32.
      - "float"  — always float32 (bit-exact legacy path).
      - "u8"     — always uint8; float input is quantised to 1/255 steps
                   (exactly the precision of the PNG crops the reference's
                   own pipeline stores, FaceVideoDataModule detections).
      - "yuv420" — packed planar YUV 4:2:0 uint8 (1.5 B/px, data.yuv):
                   the native layout of video sources; RGB is
                   reconstructed on device.
    All transports return the same code dict; the per-frame codes are
    packed into ONE device array inside the jitted forward and fetched with
    a single D2H per chunk (6 per-key fetches cost ~6 ms RTT each through
    the tunnel)."""

    encoder: object  # models.emoca.EmocaEncoder
    variables: Dict
    max_b: int = 32
    with_global_pose: bool = False
    average_shape_decode: bool = True
    crash_on_invalid: bool = True
    transport: str = "auto"
    inflight: int = 2  # chunk results left un-fetched while later chunks fly

    def __post_init__(self):
        import jax
        import jax.numpy as jnp

        from .yuv import yuv420_to_rgb

        def fwd(v, x, hw=None):
            if x.dtype == jnp.uint8:
                x = (yuv420_to_rgb(x, *hw) if x.ndim == 2
                     else x.astype(jnp.float32) / 255.0)
            codes = self.encoder.apply(v, x, train=False)
            keys = sorted(codes)
            return jnp.concatenate(
                [codes[k].astype(jnp.float32) for k in keys], axis=-1)

        self._apply = jax.jit(fwd, static_argnums=(2,))
        self._spec = None  # [(key, width)] resolved on first encode

    def _code_spec(self, x_probe) -> list:
        if self._spec is None:
            import jax

            shapes = jax.eval_shape(
                lambda v, x: self.encoder.apply(v, x, train=False),
                self.variables, x_probe)
            self._spec = [(k, shapes[k].shape[-1]) for k in sorted(shapes)]
        return self._spec

    def encode_frames(self, frames: np.ndarray) -> Dict[str, np.ndarray]:
        """(T, H, W, 3) images in [0, 1] float or {0..255} uint8 ->
        per-frame code arrays.

        Chunked by ``max_b`` with tail padding so every dispatch reuses one
        compiled executable (the reference's max_b loop re-traces ragged
        tails; Preprocessors.py:381-405); ``inflight`` chunks overlap
        transfer with fetch (data.batching.chunked_apply)."""
        import jax.numpy as jnp

        from .batching import chunked_apply
        from .yuv import rgb_to_yuv420

        t, h, w = frames.shape[:3]
        transport = self.transport
        if transport == "auto":
            transport = "u8" if frames.dtype == np.uint8 else "float"
        if transport == "float":
            send = frames.astype(np.float32, copy=False)
            if frames.dtype == np.uint8:
                send = send / 255.0
        else:
            u8 = (frames if frames.dtype == np.uint8 else
                  np.clip(np.rint(np.asarray(frames) * 255.0), 0,
                          255).astype(np.uint8))
            send = rgb_to_yuv420(u8) if transport == "yuv420" else u8
        hw = (h, w) if transport == "yuv420" else None
        spec = self._code_spec(
            jnp.zeros((self.max_b, h, w, 3), jnp.float32))
        packed = chunked_apply(
            lambda c: self._apply(self.variables, c, hw),
            send, self.max_b, inflight=self.inflight)
        return self._split_codes(packed, spec)

    def encode_packed_yuv420(
        self, packed_frames: np.ndarray, height: int, width: int
    ) -> Dict[str, np.ndarray]:
        """Encode frames that are ALREADY packed planar yuv420 rows
        (T, H*W*3/2) uint8 — what ``data.videoio.iter_video_yuv420``
        streams. The fastest ingestion path: zero host pixel work, 1.5 B/px
        on the wire, RGB reconstructed on device (data.yuv)."""
        import jax.numpy as jnp

        from .batching import chunked_apply
        from .yuv import yuv420_packed_size

        if packed_frames.ndim != 2 or \
                packed_frames.shape[1] != yuv420_packed_size(height, width):
            raise ValueError(
                f"expected (T, {yuv420_packed_size(height, width)}) packed "
                f"yuv420 rows for {height}x{width}, got "
                f"{packed_frames.shape}")
        spec = self._code_spec(
            jnp.zeros((self.max_b, height, width, 3), jnp.float32))
        packed = chunked_apply(
            lambda c: self._apply(self.variables, c, (height, width)),
            packed_frames, self.max_b, inflight=self.inflight)
        return self._split_codes(packed, spec)

    def _split_codes(self, packed: np.ndarray, spec) -> Dict[str, np.ndarray]:
        out, off = {}, 0
        for key, width in spec:
            out[key] = packed[:, off : off + width]
            off += width
        return out

    def pseudo_gt(
        self,
        frames: Optional[np.ndarray] = None,  # (T, H, W, 3) [0,1] f32 | u8
        landmark_validity: Optional[np.ndarray] = None,  # (T,)
        codes: Optional[Dict[str, np.ndarray]] = None,  # precomputed encode
    ) -> Dict[str, np.ndarray]:
        """EmocaPreprocessor.forward semantics (Preprocessors.py:405-489):
        zero global pose, landmark-validity-weighted average shape. Pass
        ``codes`` (from ``encode_frames``/``encode_packed_yuv420``) to skip
        the encoder pass — then ``frames`` may be None."""
        if codes is None and frames is None:
            raise ValueError("pseudo_gt needs frames or precomputed codes")
        codes = dict(self.encode_frames(frames) if codes is None else codes)
        T = codes["exp"].shape[0]
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
    detections: Optional[np.ndarray] = None,  # (T, H, W, 3) [0,1] f32 | u8
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
        dst = os.path.join(clip_dir, name + ".wav")
        if not os.path.exists(dst) or not os.path.samefile(wav_src, dst):
            shutil.copyfile(wav_src, dst)  # video path demuxes in place
    if detections is not None:
        from ..viz.pngio import write_png

        det_dir = os.path.join(clip_dir, "detections")
        os.makedirs(det_dir, exist_ok=True)
        for t in range(T):
            d = detections[t]
            if d.dtype != np.uint8:
                d = (np.clip(d, 0, 1) * 255).astype(np.uint8)
            write_png(os.path.join(det_dir, f"{t:05d}_000.png"), d)
    return clip_dir


def _detect_crop_stream(
    chunks_factory,  # () -> fresh generator of (n, (blk, H, W, 3) u8)
    blk: int,
    detector,
    box_detector,
    crop_size: int,
    crop_scale: float,
    crop_smooth_sigma: float,
    validity: Optional[np.ndarray],
):
    """Two streaming passes over full-resolution frames: (1) detect the
    landmark track, (2) warp-crop from the (optionally smoothed) box track
    (FaceVideoDataModule's detect step). Full-res frames live on host only
    one ``blk`` chunk at a time (a 900-frame 1080p clip would be ~5.6 GB
    decoded at once even as uint8) and every device dispatch reuses one
    (blk, H, W) executable instead of re-tracing per clip length.

    Returns (crops_u8 (T, S, S, 3), crop-space landmarks (T, 68, 2) in
    [-1, 1], validity (T,) or None)."""
    from .facecrop import (
        bbox2point_kpt68,
        detect_fullframe_landmarks,
        landmarks_to_crop_space,
        smooth_track,
        warp_crop,
    )

    lmks, scs = [], []
    for n, full in chunks_factory():
        l, s = detect_fullframe_landmarks(detector, full,
                                          box_detector=box_detector)
        lmks.append(l[:n])
        scs.append(s[:n])
    if not lmks:  # empty source (e.g. zero-frame video): skip the clip
        return None, None, validity
    lmk_px = np.concatenate(lmks)
    scores = np.concatenate(scs)
    det_val = np.clip(scores.mean(-1), 0.0, None).astype(np.float32)
    old_size, center = bbox2point_kpt68(lmk_px)
    size = (old_size * crop_scale).astype(np.float32)
    if crop_smooth_sigma > 0:
        center, size = smooth_track(center, size, validity=det_val,
                                    sigma=crop_smooth_sigma)
    crops = []
    done = 0
    for n, full in chunks_factory():
        cb, sb = center[done : done + blk], size[done : done + blk]
        done += n
        if cb.shape[0] < blk:  # padded tail: repeat the last box
            pad = blk - cb.shape[0]
            cb = np.concatenate([cb, np.repeat(cb[-1:], pad, axis=0)])
            sb = np.concatenate([sb, np.repeat(sb[-1:], pad, axis=0)])
        # crops come back uint8 (quantised ON device — 4x fewer D2H bytes;
        # exactly the precision of the detections/*.png the folder layout
        # stores anyway)
        crops.append(warp_crop(full, cb, sb, crop_size, out_u8=True)[:n])
    frames = np.concatenate(crops)
    det_lmk = landmarks_to_crop_space(lmk_px, center, size, crop_size)
    if validity is None:
        s = det_val.sum()
        validity = det_val if np.isfinite(s) and s > 0 else None
    return frames, det_lmk, validity


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

    from ..viz.pngio import read_image_u8

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
        blk = pre.max_b

        def _chunks():
            # uint8 all the way to the device: the detectors and the warp
            # normalise on device, so full-res frames cross the wire at
            # 1 B/px (4x fewer bytes than the old fp32 transport)
            for i in range(0, len(paths), blk):
                ps = paths[i : i + blk]
                n = len(ps)
                ps = ps + [ps[-1]] * (blk - n)
                yield n, np.stack([read_image_u8(p) for p in ps])

        frames, det_lmk, validity = _detect_crop_stream(
            _chunks, blk, detector, box_detector, crop_size, crop_scale,
            crop_smooth_sigma, validity)
    else:
        frames = np.stack([read_image_u8(p) for p in paths])
    if not crop_full_frames and detector is not None:
        det_lmk, det_scores = detector(frames)
        if validity is None:
            validity = np.clip(det_scores.mean(-1), 0.0, None)
            s = validity.sum()
            if not np.isfinite(s) or s <= 0:
                validity = None  # degenerate scores -> uniform weights
    raw = pre.encode_frames(frames)
    name = os.path.basename(src_dir.rstrip("/"))
    wavs = glob.glob(os.path.join(src_dir, "*.wav"))
    return _finalize_clip(
        pre, frames, raw, validity, det_lmk,
        os.path.join(out_dir, name), wavs[0] if wavs else None,
        write_detections, parser, flame)


def _finalize_clip(
    pre: EmocaPreprocessor,
    frames: Optional[np.ndarray],  # None on the frame-free packed path
    raw: Dict[str, np.ndarray],
    validity: Optional[np.ndarray],
    det_lmk: Optional[np.ndarray],
    clip_path: str,
    wav_src: Optional[str],
    write_detections: bool,
    parser,
    flame,
) -> str:
    """Shared tail of the folder/video preprocessors: pseudo-GT averaging,
    MEAD folder layout, segmentation masks, landmark export."""
    codes = pre.pseudo_gt(frames, validity, codes=raw)
    clip_dir = write_emoca_folders(
        clip_path, codes, wav_src=wav_src,
        detections=frames if (write_detections and frames is not None)
        else None)
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


def preprocess_clip_video(
    pre: EmocaPreprocessor,
    video_path: str,  # any container/codec the host ffmpeg can decode
    out_dir: str,
    fps: Optional[float] = 25.0,  # resample rate; None keeps source fps
    write_detections: bool = True,
    flame=None,
    detector=None,
    crop_full_frames: bool = False,
    crop_size: int = 224,
    crop_scale: float = 1.25,
    crop_smooth_sigma: float = 0.0,
    box_detector=None,
    parser=None,
    extract_audio: bool = True,
) -> Optional[str]:
    """One video file -> one EMOCA-preprocessed clip folder — the
    in-framework equivalent of the reference's skvideo ingestion
    (FaceVideoDataModule.py:50,422-429 reads mp4 via vreader/vread; MEAD
    audio is demuxed the scripts/audio.sh way).

    Decoding streams through an ffmpeg rawvideo pipe (data.videoio), so a
    clip of any length/resolution holds at most one ``max_b`` chunk of
    frames in host memory during detection/cropping. Pre-cropped videos
    (``crop_full_frames=False``) with ``write_detections=False`` and no
    detector/parser take the FRAME-FREE path: packed yuv420p rows go
    straight from the decoder to the device (zero host pixel conversion,
    1.5 B/px on the wire — the fastest pseudo-GT extraction mode).

    Options mirror ``preprocess_clip_folder``; ffmpeg absence raises
    ``videoio.FfmpegMissingError`` naming the PNG-folder fallback."""
    from .videoio import extract_wav, iter_video_yuv420, probe_video
    from .yuv import yuv420_to_rgb_host

    info = probe_video(video_path)
    name = os.path.splitext(os.path.basename(video_path))[0]
    validity = None  # video sources have no sidecar validity.npy
    det_lmk = None
    blk = pre.max_b

    def _rgb(packed_chunk: np.ndarray) -> np.ndarray:
        rgb = yuv420_to_rgb_host(packed_chunk, info.height, info.width)
        return np.clip(np.rint(rgb * 255.0), 0, 255).astype(np.uint8)

    if crop_full_frames:
        if detector is None:
            raise ValueError("crop_full_frames needs a landmark detector")

        def _chunks():
            # each pass re-opens the decode pipe (streaming two-pass crop:
            # memory stays bounded; decode is cheaper than a full-res
            # host-RAM buffer)
            for pk in iter_video_yuv420(video_path, fps=fps, chunk=blk,
                                        info=info):
                n = pk.shape[0]
                full = _rgb(pk)
                if n < blk:
                    full = np.concatenate(
                        [full, np.repeat(full[-1:], blk - n, axis=0)])
                yield n, full

        frames, det_lmk, validity = _detect_crop_stream(
            _chunks, blk, detector, box_detector, crop_size, crop_scale,
            crop_smooth_sigma, validity)
        if frames is None:  # zero-frame decode: skip like the folder path
            return None
        raw = pre.encode_frames(frames)
    else:
        chunks = list(iter_video_yuv420(video_path, fps=fps, chunk=blk,
                                        info=info))
        if not chunks:
            return None
        if write_detections or detector is not None or parser is not None:
            frames = np.concatenate([_rgb(c) for c in chunks])
            if detector is not None:
                det_lmk, det_scores = detector(frames)
                validity = np.clip(det_scores.mean(-1), 0.0, None)
                s = validity.sum()
                if not np.isfinite(s) or s <= 0:
                    validity = None
            raw = pre.encode_frames(frames)
        else:
            frames = None  # frame-free: packed rows straight to the device
            raw = pre.encode_packed_yuv420(
                np.concatenate(chunks), info.height, info.width)
    clip_path = os.path.join(out_dir, name)
    wav_src = None
    if extract_audio:
        os.makedirs(clip_path, exist_ok=True)
        wav_path = os.path.join(clip_path, name + ".wav")
        if extract_wav(video_path, wav_path):
            wav_src = wav_path  # write_emoca_folders copyfile(src==dst)-safe
    return _finalize_clip(pre, frames, raw, validity, det_lmk, clip_path,
                          wav_src, write_detections, parser, flame)
