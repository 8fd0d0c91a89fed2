"""PIRender video-pair training data (source/driving frame sampling).

The in-framework counterpart of the reference's VoxDataset /
VoxVideoDataset (third_party/pirender/data/vox_dataset.py:21-131,
vox_video_dataset.py:13-104): per sample, pick an identity, pick one of its
clips, pick a random (source, target) frame pair from the same clip, and
emit the source image + the target image + the edge-clamped
``2*radius+1``-frame coefficient window centred on the target frame
(semantic_radius=13 -> the 27-frame window MappingNet consumes).

Instead of the reference's LMDB-of-VoxCeleb, the source is any
EMOCA-preprocessed MEAD root (data.mead layout: detection crops +
exp/pose/cam codes) — the same folders the rest of the framework trains
from, including the output of ``cli preprocess-mead``. The descriptor is
the 59-d FLAME layout [exp50 | rot3 | jaw3 | cam3]
(pipeline.portrait.build_semantics) that net_G import parity pins.

``cross_id`` reproduces VoxVideoDataset's cross-reenactment evaluation
sampling: the source image comes from a different identity.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterator, List, Optional

import numpy as np

from .mead import MeadEmocaDataset


def obtain_seq_index(index: int, num_frames: int, radius: int) -> List[int]:
    """Edge-clamped window indices (vox_dataset.py:127-130).

    Host-side numpy twin of the traced versions in
    ``train.render_loss.obtain_seq_index`` / ``pipeline.portrait.
    semantic_windows`` (same semantics, pinned by their shared tests); kept
    separate so the data layer never dispatches jax ops per sample."""
    return [min(max(i, 0), num_frames - 1)
            for i in range(index - radius, index + radius + 1)]


@dataclasses.dataclass
class VideoPairDataset:
    """Samples (source_image, target_image, target coeff window) training
    pairs from an EMOCA-preprocessed root."""

    root: str
    radius: int = 13  # semantic_radius
    cross_id: bool = False
    image_size: Optional[int] = None  # resize crops (None = native)
    seed: int = 0

    def __post_init__(self):
        self.ds = MeadEmocaDataset(root=self.root, load_images=False)
        self._rng = np.random.default_rng(self.seed)
        # clips with both crops and codes
        self.clips = []
        for i, clip in enumerate(self.ds.index):
            paths = self.ds.image_paths(i)
            if len(paths) >= 2:
                self.clips.append({
                    "index": i,
                    "name": clip["name"],
                    "person": os.path.basename(clip["name"]).split("_")[0],
                    "images": paths,
                })
        self.person_ids = sorted({c["person"] for c in self.clips})
        self._by_person: Dict[str, List[int]] = {}
        for k, c in enumerate(self.clips):
            self._by_person.setdefault(c["person"], []).append(k)
        self._sem_cache: Dict[int, np.ndarray] = {}

    def __len__(self) -> int:
        return len(self.clips)

    # -- internals -----------------------------------------------------------

    def _semantics(self, k: int) -> np.ndarray:
        """(T, 59) raw [exp | rot | jaw | cam] descriptor for clip k."""
        if k not in self._sem_cache:
            clip = self.ds.index[self.clips[k]["index"]]
            codes = self.ds._load_codes(clip["frames"])
            exp = codes["exp"][:, :50]
            if exp.shape[1] < 50:
                exp = np.pad(exp, ((0, 0), (0, 50 - exp.shape[1])))
            sem = np.concatenate(
                [exp, codes["pose"][:, :3], codes["pose"][:, 3:6],
                 codes["cam"][:, :3]], axis=-1).astype(np.float32)
            self._sem_cache[k] = sem
        return self._sem_cache[k]

    def _image(self, k: int, t: int) -> np.ndarray:
        from ..viz.pngio import read_image_normalized

        paths = self.clips[k]["images"]
        img = read_image_normalized(paths[min(t, len(paths) - 1)])
        if self.image_size and img.shape[0] != self.image_size:
            import jax
            import jax.numpy as jnp

            img = np.asarray(jax.image.resize(
                jnp.asarray(img),
                (self.image_size, self.image_size, 3), "bilinear"))
        return img

    def _window(self, k: int, t: int) -> np.ndarray:
        sem = self._semantics(k)
        idx = obtain_seq_index(t, sem.shape[0], self.radius)
        return sem[idx]  # (2r+1, 59)

    # -- sampling ------------------------------------------------------------

    def sample(self) -> Dict[str, np.ndarray]:
        """One training pair (VoxDataset.__getitem__ semantics)."""
        person = self.person_ids[self._rng.integers(0, len(self.person_ids))]
        k = self._by_person[person][
            self._rng.integers(0, len(self._by_person[person]))]
        T = min(len(self.clips[k]["images"]),
                self._semantics(k).shape[0])
        # with replacement (s may equal t), matching the reference's
        # random.choices(range(num_frame), k=2) at vox_dataset.py:110
        s, t = self._rng.integers(0, T, size=2)
        if self.cross_id and len(self.person_ids) > 1:
            other = person
            while other == person:
                other = self.person_ids[
                    self._rng.integers(0, len(self.person_ids))]
            ks = self._by_person[other][
                self._rng.integers(0, len(self._by_person[other]))]
            # first frame of the OTHER identity's clip; its semantics must
            # describe that frame, not the target person's clip
            # (vox_video_dataset.py:32-35)
            src_img = self._image(ks, 0)
            src_sem = self._window(ks, 0)
        else:
            src_img = self._image(k, int(s))
            src_sem = self._window(k, int(s))
        return {
            "input_image": src_img,
            "target_image": self._image(k, int(t)),
            "coeff_window": self._window(k, int(t)),
            "source_semantics": src_sem,
        }

    def batches(self, batch_size: int,
                epochs: Optional[int] = None) -> Iterator[Dict[str, np.ndarray]]:
        """Batched iterator in the PIRenderTrainer batch layout
        (input_image/target_image in [-1,1] NHWC, coeff_window (B, 27, C))."""
        # the reference inflates person_ids x100 to define an epoch
        # (vox_dataset.py:45); one epoch here = 100 batches per person
        per_epoch = max(1, 100 * len(self.person_ids) // max(batch_size, 1))
        e = 0
        while epochs is None or e < epochs:
            for _ in range(per_epoch):
                samples = [self.sample() for _ in range(batch_size)]
                yield {
                    key: np.stack([s[key] for s in samples])
                    for key in samples[0]
                }
            e += 1
