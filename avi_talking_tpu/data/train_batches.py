"""Real-data training batches for EMOTE and stage-1 FaceFormer.

Round 2 left both training CLIs on synthetic random batches; this module
feeds them from an EMOCA-preprocessed MEAD root:

* ``EmoteBatchBuilder`` — `MeadEmocaDataset` items -> the
  `TalkingHeadTrainer` batch contract (framed raw audio, denormalised
  gt_exp/gt_jaw, one-hot style conditions, shape codes, frame_mask), the
  counterpart of the reference's Lightning data path into
  TalkingHeadBase.forward (/root/reference/dataset/data_loader.py:229-374
  -> third_party/inferno/.../TalkingHeadBase.py:503-553).

* ``FanConditioner`` — the in-loop stage-1 conditioning the reference
  computes per batch with a frozen FanEncoder
  (/root/reference/models/faceformer.py:334-373): per-frame eye embeddings
  from the raw crops, emotion embeddings from lip-masked *shuffled* frames
  (offset 4..8, the frame-swap disentangling trick), and a ref-style coeff
  from one random frame. TPU-first: the host only shuffles indices; both
  FanEncoder forwards run batched over B*T frames inside one jitted call.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from .captions import MeadFilenameParser
from .mead import MeadEmocaDataset


@dataclasses.dataclass
class EmoteBatchBuilder:
    """Indexable view over a MEAD root yielding fixed-shape per-item dicts
    (stackable by ``data.batching.default_collate``).

    Per item (all float32):
      raw_audio  (frames, 640)    16 kHz audio framed at 25 fps
      gt_exp     (frames, n_exp)  denormalised FLAME expression
      gt_jaw     (frames, 3)      denormalised jaw pose
      expression (n_expressions,) one-hot  \
      intensity  (n_intensities,) one-hot   > MEAD filename conditions
      identity   (n_identities,)  one-hot  /
      shape      (n_shape,)       first-frame EMOCA shape code (fit to
                                  n_shape; also returned as gt_shape)
      frame_mask (frames,)        1 for real frames, 0 for padding
    Clips without a wav or an unparseable name are dropped at init.
    """

    ds: MeadEmocaDataset
    frames: int
    n_exp: int = 50
    n_shape: int = 300
    n_expressions: int = 9
    n_intensities: int = 3
    n_identities: int = 32

    def __post_init__(self):
        parser = MeadFilenameParser()
        self.valid: List[int] = []
        for i, clip in enumerate(self.ds.index):
            if not clip.get("wav"):
                continue
            try:
                import os

                parser.parse(os.path.basename(clip["name"]))
            except (ValueError, KeyError, IndexError):
                continue
            self.valid.append(i)
        # window the dataset at our frame count
        self.ds.seq_length = self.frames

    def __len__(self) -> int:
        return len(self.valid)

    def split(
        self, val_fraction: float, seed: int = 0
    ) -> ("EmoteBatchBuilder", "EmoteBatchBuilder"):
        """Clip-level deterministic train/val split (crc32-ordered names,
        count-based so tiny fixture trees get both sides). Identity-level
        splitting is available upstream via MeadEmocaDataset(subject_split=)."""
        import copy
        import zlib

        names = [self.ds.index[i]["name"] for i in self.valid]
        order = sorted(
            range(len(names)),
            key=lambda k: zlib.crc32(f"{seed}:{names[k]}".encode()),
        )
        n_val = int(round(val_fraction * len(order)))
        if val_fraction > 0 and len(order) >= 2:
            n_val = min(max(n_val, 1), len(order) - 1)
        val_set = set(order[:n_val])
        tr = copy.copy(self)
        va = copy.copy(self)
        tr.valid = [v for k, v in enumerate(self.valid) if k not in val_set]
        va.valid = [v for k, v in enumerate(self.valid) if k in val_set]
        # val windows must be deterministic: leading crop, fixed caption
        va.ds = copy.copy(self.ds)
        va.ds.split = "val"
        return tr, va

    def _fit(self, x: np.ndarray, width: int) -> np.ndarray:
        if x.shape[-1] >= width:
            return x[..., :width]
        pad = [(0, 0)] * (x.ndim - 1) + [(0, width - x.shape[-1])]
        return np.pad(x, pad)

    def __getitem__(self, k: int) -> Dict[str, np.ndarray]:
        item = self.ds[self.valid[k]]
        T = self.frames
        coeff = self.ds.stats.denormalize(item["coeff"])  # (L, E+9) raw
        L = coeff.shape[0]
        E = coeff.shape[-1] - 9  # layout: [exp(E), jaw3, glob_rot3, cam3]
        gt_exp = np.zeros((T, self.n_exp), np.float32)
        gt_exp[:L] = self._fit(coeff[:, :E], self.n_exp)
        gt_jaw = np.zeros((T, 3), np.float32)
        gt_jaw[:L] = coeff[:, E : E + 3]
        audio = np.zeros((T, 640), np.float32)
        audio[:L] = np.asarray(item["audio"], np.float32).reshape(-1, 640)[:L]
        mask = np.zeros((T,), np.float32)
        mask[:L] = 1.0

        def onehot(idx, n):
            v = np.zeros((n,), np.float32)
            v[int(idx)] = 1.0
            return v

        shape = self._fit(
            np.asarray(item["shape"][0], np.float32), self.n_shape
        )
        return {
            "raw_audio": audio,
            "gt_exp": gt_exp,
            "gt_jaw": gt_jaw,
            "expression": onehot(item["emotion_idx"], self.n_expressions),
            "intensity": onehot(item["intensity_idx"], self.n_intensities),
            "identity": onehot(item["identity_idx"], self.n_identities),
            "shape": shape,
            "gt_shape": shape,
            "frame_mask": mask,
        }


def emote_batches(
    builder: EmoteBatchBuilder,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    epochs: Optional[int] = None,
):
    """Infinite (epochs=None) or bounded stacked-batch iterator."""
    from .batching import batch_iterator

    return batch_iterator(
        builder, batch_size, shuffle=shuffle, seed=seed,
        drop_last=True, epochs=epochs,
    )


@dataclasses.dataclass
class FaceFormerBatchBuilder:
    """MEAD root -> stage-1 FaceFormer batches (data_loader.py:229-374).

    Per item:
      audio      (frames*640,)       flat 16 kHz samples
      coeff      (frames, coeff_dim) NORMALISED coeff window (edge-padded so
                                     teacher forcing never sees zero jumps)
      frame_mask (frames,)
      pose       (frames, 6)         raw EMOCA pose (global rot + jaw)
      cam        (frames, 3)         raw EMOCA camera
      img        (frames, H, W, 3)   detection crops (only when the root has
                                     them and ``load_images``)
      ref_img    (frames, H, W, 3)   neutral-reference crops (with images)
      emo_idx    ()                  int MEAD emotion label (train.emo_cls
                                     EMO2IDX order; -1 if unparseable)
    pose/cam/ref_img feed the PIRender render loss
    (train.render_loss.PIRenderRenderLoss batch contract); emo_idx feeds
    the disentangle emo-cls loss (faceformer_disentangle.py:719).
    """

    ds: MeadEmocaDataset
    frames: int
    coeff_dim: int = 53
    load_images: bool = True

    def __post_init__(self):
        self.valid = [
            i for i, clip in enumerate(self.ds.index) if clip.get("wav")
        ]
        self.ds.seq_length = self.frames
        self.ds.load_images = self.load_images

    def __len__(self) -> int:
        return len(self.valid)

    def __getitem__(self, k: int) -> Dict[str, np.ndarray]:
        item = self.ds[self.valid[k]]
        T = self.frames
        coeff = np.asarray(item["coeff"], np.float32)[:, : self.coeff_dim]
        L = coeff.shape[0]
        out: Dict[str, np.ndarray] = {}
        c = np.zeros((T, coeff.shape[1]), np.float32)
        c[:L] = coeff
        if L < T:
            c[L:] = coeff[-1]  # edge pad
        out["coeff"] = c
        audio = np.zeros((T * 640,), np.float32)
        a = np.asarray(item["audio"], np.float32).reshape(-1)
        audio[: min(a.shape[0], T * 640)] = a[: T * 640]
        out["audio"] = audio
        mask = np.zeros((T,), np.float32)
        mask[:L] = 1.0
        out["frame_mask"] = mask
        from ..train.emo_cls import EMO2IDX

        name = self.ds.index[self.valid[k]].get("name", "")
        parts = name.split("_")
        out["emo_idx"] = np.int32(
            EMO2IDX.get(parts[2], -1) if len(parts) > 2 else -1
        )
        for key in ("pose", "cam"):
            v = np.asarray(item[key], np.float32)
            padded = np.zeros((T, v.shape[1]), np.float32)
            padded[: v.shape[0]] = v[:T]
            if v.shape[0] < T:
                padded[v.shape[0]:] = v[-1]
            out[key] = padded
        for src, dst in (("img", "img"), ("ref_img", "ref_img")):
            if src in item:
                img = np.asarray(item[src], np.float32)
                if img.shape[0] < T:
                    img = np.concatenate(
                        [img, np.repeat(img[-1:], T - img.shape[0], axis=0)]
                    )
                out[dst] = img[:T]
        return out


@dataclasses.dataclass
class FanConditioner:
    """Frozen-FanEncoder stage-1 conditioning (faceformer.py:334-373).

    ``condition(img, coeff, rng)``:
      img   (B, T, H, W, 3) float32 [-1, 1] detection crops
      coeff (B, T, C)       normalised coeff sequence
    ->
      eye_embed (B, T, eye_dim)  per-frame eye head on the raw crops
      emo_embed (B, T, emo_dim)  emotion head on lip-masked frames taken at
                                 i+offset (offset~U[4,8), wrap to i-offset)
      ref_coeff (B, 1, C)        coeff at ONE random frame (whole batch,
                                 torch.randint(frame_num, size=(1,)))
    Both FanEncoder passes run batched over B*T inside one jit.
    """

    fan: "object"  # models.fan_encoder.FanEncoder
    variables: Dict
    seed: int = 0
    mask_variant: str = "coeff"

    def __post_init__(self):
        import jax
        import jax.numpy as jnp

        from ..models.fan_encoder import mask_lip

        fan, variables = self.fan, self.variables
        variant = self.mask_variant

        def _embed(img_flat: "jax.Array", emo_img_flat: "jax.Array"):
            _, eye, _, _ = fan.apply(variables, img_flat)
            _, _, emo, _ = fan.apply(variables, mask_lip(emo_img_flat, variant))
            return eye, emo

        self._embed = jax.jit(_embed)
        self._rng = np.random.default_rng(self.seed)
        self._jnp = jnp

    def shuffle_indices(self, T: int) -> np.ndarray:
        """Reference offset rule per frame: j = i+off if in range else
        i-off, off ~ U[4, 8) (faceformer.py:346-348)."""
        off = self._rng.integers(4, 8, size=T)
        i = np.arange(T)
        j = np.where(i + off < T, i + off, i - off)
        return np.clip(j, 0, T - 1)

    def condition(
        self, img: np.ndarray, coeff: np.ndarray
    ) -> Dict[str, "object"]:
        jnp = self._jnp
        B, T = img.shape[:2]
        flat = jnp.asarray(img).reshape(B * T, *img.shape[2:])
        sh = np.stack([self.shuffle_indices(T) for _ in range(B)])  # (B,T)
        emo_src = jnp.asarray(
            np.asarray(img)[np.arange(B)[:, None], sh]
        ).reshape(B * T, *img.shape[2:])
        eye, emo = self._embed(flat, emo_src)
        ref_idx = int(self._rng.integers(0, T))
        return {
            "eye_embed": eye.reshape(B, T, -1),
            "emo_embed": emo.reshape(B, T, -1),
            "ref_coeff": jnp.asarray(coeff[:, ref_idx:ref_idx + 1]),
        }
