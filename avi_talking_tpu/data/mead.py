"""MEAD / EMOCA-preprocessed talking-face dataset.

Port of the reference's TalkDataset (/root/reference/dataset/data_loader.py:67-378
+ dataset/emoca_utils.py): each clip directory holds per-frame EMOCA codes
(``EMOCA_v2_lr_mse_20/<frame>_000/{exp,pose,shape,cam}.npy``) plus the clip
wav. Item construction:

  * random (train) / leading (eval) ``seq_length``-frame crop,
  * audio sliced at 640 samples/frame (16 kHz, 25 fps) and
    Wav2Vec2Processor-normalised,
  * coeff = concat[exp(50), jaw(3), global-rot(3), cam(3)] z-normalised by
    CoeffStats (stats regenerable from data — the Mead npys are not shipped),
  * per-identity neutral reference clip lookup,
  * optional butterworth pose smoothing (data_loader.py:37-62).

The directory index is cached to ``index_cache.json`` in the data root
(mirrors the reference's datadict pickle cache but human-readable). Images
(``detections/*.png``) are indexed but decoded lazily only when a consumer
(render losses / FanEncoder) asks — the coefficient path never touches them.
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..audio.frontend import SAMPLES_PER_FRAME, normalize_audio, read_wav
from .captions import MeadFilenameParser
from .stats import CoeffStats


def _scan_clip(root: str, name: str) -> Optional[Dict]:
    frames_dir = os.path.join(root, name, "EMOCA_v2_lr_mse_20")
    if not os.path.isdir(frames_dir):
        return None
    frame_names = sorted(
        fn
        for fn in os.listdir(frames_dir)
        if os.path.isdir(os.path.join(frames_dir, fn))
        and "processed" not in fn
        and fn.endswith("_000")
    )
    if not frame_names:
        return None
    wav = os.path.join(root, name, name + ".wav")
    return {
        "name": name,
        "frames": [os.path.join(frames_dir, fn) for fn in frame_names],
        "wav": wav if os.path.exists(wav) else None,
    }


def build_index(root: str, use_cache: bool = True) -> List[Dict]:
    cache = os.path.join(root, "index_cache.json")
    if use_cache and os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)
    clips = []
    for name in sorted(os.listdir(root)):
        if os.path.isfile(os.path.join(root, name)):
            continue
        meta = _scan_clip(root, name)
        if meta is None:
            # nested layout <root>/<group>/<clip>
            for sub in sorted(os.listdir(os.path.join(root, name))):
                m = _scan_clip(root, os.path.join(name, sub))
                if m:
                    clips.append(m)
        else:
            clips.append(meta)
    if use_cache:
        try:
            with open(cache, "w") as f:
                json.dump(clips, f)
        except OSError:
            pass
    return clips


@dataclasses.dataclass
class ScreenedMeadAudio:
    """Audio screening over one or more MEAD roots (the reference's
    ``ScreenedMeadAudio``, /root/reference/train_diffusion_prior.py:40-75):
    keep only clips that (a) scan successfully, (b) have a caption from the
    generator, and (c) whose wav is on the ``good audio`` allowlist (a text
    file of paths, one per line; reference ``meta_audio.txt``). Result:
    sorted ``wav_paths`` (+ matching clip names / captions, which the
    reference threw away but the instruct loop needs anyway)."""

    roots: Sequence[str]
    allowlist_path: Optional[str] = None
    caption_db: Optional[object] = None  # .query(name) -> caption

    def __post_init__(self):
        allow = None
        if self.allowlist_path:
            with open(self.allowlist_path) as f:
                allow = {ln.strip() for ln in f if ln.strip()}
        if self.caption_db is None:
            from .caption_gen import TalkClipGenerator

            self.caption_db = TalkClipGenerator()
        entries = []
        for root in self.roots:
            for clip in build_index(root):
                wav = clip.get("wav")
                if not wav:
                    continue
                try:
                    caption = self.caption_db.query(clip["name"])
                except Exception:
                    continue
                if allow is not None and wav not in allow:
                    continue
                entries.append((wav, clip["name"], caption))
        entries.sort()
        self.wav_paths = [e[0] for e in entries]
        self.names = [e[1] for e in entries]
        self.captions = [e[2] for e in entries]

    def __len__(self) -> int:
        return len(self.wav_paths)


@dataclasses.dataclass
class MeadEmocaDataset:
    root: str
    seq_length: int = 25
    split: str = "train"
    stats: Optional[CoeffStats] = None
    smooth_pose: bool = False
    seed: int = 0
    # clip-name -> caption(s) mapping (JSON file). Replacement for the
    # reference's missing `talkclip_text_generation.TalkClipDatabase.query`
    # (data_loader.py:275) — per-clip instruction captions for prior training.
    captions_path: Optional[str] = None
    # decode per-frame detection crops into `img` (the clip window) and
    # `ref_img` (leading frames of the identity's neutral clip), (T, H, W, 3)
    # float32 in [-1, 1] — data_loader.py:255-348 + to_Tensor :229-238.
    load_images: bool = False
    # identity-level partition: None (all clips) or "train"/"val"/"test",
    # the gender-stratified 32-identity split (data.splits.mead_identity_split,
    # TalkingHeadWrapper.py:168-235). Independent of `split`, which controls
    # windowing/caption sampling.
    subject_split: Optional[str] = None
    subject_split_seed: Optional[int] = None

    def __post_init__(self):
        self.index = build_index(self.root)
        if self.subject_split is not None:
            from .splits import identity_of, mead_identity_split

            allowed = set(
                mead_identity_split(seed=self.subject_split_seed)[self.subject_split]
            )
            self.index = [
                c for c in self.index if identity_of(c["name"]) in allowed
            ]
        self._captions = {}
        if self.captions_path and os.path.exists(self.captions_path):
            with open(self.captions_path) as f:
                self._captions = json.load(f)
        self.parser = MeadFilenameParser()
        self._rng = np.random.default_rng(self.seed)
        self._by_name = {c["name"]: c for c in self.index}
        # neutral reference clip per identity (data_loader.py:149-155)
        self._neutral_by_id: Dict[str, str] = {}
        for clip in self.index:
            base = os.path.basename(clip["name"])
            if "_neutral_" in base:
                ident = base.split("_")[0]
                self._neutral_by_id.setdefault(ident, clip["name"])
        # stats default to identity, sized from the first clip's coeff so
        # non-standard code dims (e.g. tiny preprocess-mead output) load
        # too — materialised here so `ds.stats` is usable right after
        # construction (callers normalize/save without iterating first)
        if self.stats is None and self.index:
            codes = self._load_codes(self.index[0]["frames"][:1])
            self.stats = CoeffStats.identity(
                self._raw_coeff(codes).shape[-1])

    def __len__(self) -> int:
        return len(self.index)

    def _load_codes(self, frames: List[str]) -> Dict[str, np.ndarray]:
        out = {}
        for key in ("exp", "pose", "shape", "cam"):
            out[key] = np.stack(
                [np.load(os.path.join(fd, f"{key}.npy")) for fd in frames]
            ).astype(np.float32)
        return out

    def compute_stats(self, max_clips: int = 200) -> CoeffStats:
        """Regenerate coeff stats from the data (the reference's missing
        coeff_mean_Mead.npy / coeff_std_Mead.npy)."""
        coeffs = []
        for clip in self.index[:max_clips]:
            codes = self._load_codes(clip["frames"])
            coeffs.append(self._raw_coeff(codes))
        return CoeffStats.from_data(np.concatenate(coeffs, axis=0))

    @staticmethod
    def _raw_coeff(codes: Dict[str, np.ndarray]) -> np.ndarray:
        exp = codes["exp"][:, :50]
        jaw = codes["pose"][:, 3:6]
        glob_rot = codes["pose"][:, :3]
        cam = codes["cam"][:, :3]
        return np.concatenate([exp, jaw, glob_rot, cam], axis=-1)  # (T, 59)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        clip = self.index[i]
        codes = self._load_codes(clip["frames"])
        if self.smooth_pose:
            from ..pipeline.postprocess import butter_lowpass_filtfilt

            if codes["pose"].shape[0] > 15:
                codes["pose"][:, :3] = butter_lowpass_filtfilt(codes["pose"][:, :3])
        coeff = self._raw_coeff(codes)
        if self.stats is None:
            self.stats = CoeffStats.identity(coeff.shape[-1])
        T = coeff.shape[0]

        L = min(self.seq_length, T)
        start = int(self._rng.integers(0, T - L + 1)) if self.split == "train" else 0
        sl = slice(start, start + L)

        item: Dict[str, np.ndarray] = {
            "name": clip["name"],
            "coeff": self.stats.normalize(coeff[sl]).astype(np.float32),
            "shape": codes["shape"][sl],
            "pose": codes["pose"][sl],
            "cam": codes["cam"][sl],
        }
        if clip["wav"]:
            wav, sr = read_wav(clip["wav"])
            a0, a1 = start * SAMPLES_PER_FRAME, (start + L) * SAMPLES_PER_FRAME
            seg = np.zeros(L * SAMPLES_PER_FRAME, np.float32)
            avail = wav[a0:a1]
            seg[: avail.shape[0]] = avail
            item["audio"] = normalize_audio(seg[None])
        base = os.path.basename(clip["name"])
        try:
            ident, emo, inten = self.parser.parse(base)
            item["identity_idx"] = np.int32(ident)
            item["emotion_idx"] = np.int32(emo)
            item["intensity_idx"] = np.int32(inten)
        except (ValueError, KeyError, IndexError):
            pass
        neutral = self._neutral_by_id.get(base.split("_")[0])
        if neutral:
            item["neutral_clip"] = neutral
        caps = self._captions.get(clip["name"]) or self._captions.get(base)
        if caps:
            caps = [caps] if isinstance(caps, str) else list(caps)
            item["text"] = caps[
                int(self._rng.integers(0, len(caps))) if self.split == "train" else 0
            ]
        if self.load_images:
            img = self._load_image_window(clip, start, L)
            if img is not None:
                item["img"] = img
                # reference frames: leading window of the identity's neutral
                # clip (ref_start_idx=0, data_loader.py:337-348); falls back
                # to the clip itself when no neutral exists (:260-262)
                ref_clip = clip
                neutral = item.get("neutral_clip")
                if neutral and neutral in self._by_name:
                    ref_clip = self._by_name[neutral]
                ref = self._load_image_window(ref_clip, 0, L)
                item["ref_img"] = ref if ref is not None else img
        return item

    def image_paths(self, i: int) -> List[str]:
        """Lazy detection-crop image paths (for render losses/FanEncoder)."""
        return self._clip_image_paths(self.index[i])

    @staticmethod
    def _clip_image_paths(clip: Dict) -> List[str]:
        """Per-frame detection crops, sorted to align with `frames`
        (emoca_utils.get_detect_paths layouts: detections either directly
        under a processed_* dir or one level deeper)."""
        frames_dir = os.path.dirname(clip["frames"][0])
        for pat in (
            os.path.join(frames_dir, "*", "detections", "*_000.png"),
            os.path.join(frames_dir, "*", "*", "detections", "*_000.png"),
            os.path.join(os.path.dirname(frames_dir), "*", "detections", "*_000.png"),
            # cli preprocess-mead layout: crops directly under the clip dir
            os.path.join(os.path.dirname(frames_dir), "detections", "*_000.png"),
        ):
            cands = sorted(glob.glob(pat))
            if cands:
                return cands
        return []

    def _load_image_window(
        self, clip: Dict, start: int, length: int
    ) -> Optional[np.ndarray]:
        """(length, H, W, 3) float32 [-1, 1] or None when crops are absent;
        short clips pad by repeating the last frame."""
        from ..viz.pngio import read_image_normalized

        paths = self._clip_image_paths(clip)
        if not paths:
            return None
        window = [
            paths[min(start + k, len(paths) - 1)] for k in range(length)
        ]
        return np.stack([read_image_normalized(p) for p in window])
