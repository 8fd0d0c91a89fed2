"""The product API: (wav, natural-language instruction) -> animated FLAME face.

TPU-native equivalent of the reference's instruction-following inference loop
(``is_talking_instruct``, /root/reference/train_diffusion_prior.py:655-774 +
voxel2style_emb :783 + run_evalutation):

    instruction --tokenize--> CLIP text tower --mean over 77 tokens-->
    BrainNetwork --> 100-step DDPM prior sample --> 128-d style embedding
    wav --frame--> wav2vec2 --> EMOTE decoder (+style) --> FLINT -->
    exp (T,50) + jaw (T,3) --> FLAME --> vertices (T, 5023, 3)

Device work for a single request is ONE jitted dispatch (the whole chain
above fused; measured RTF 0.00125 on a v5e). Batched serving
(``generate_batch``) uses one style-sampling dispatch plus one animate
dispatch per length bucket. Host work: wav decode/framing and tokenization.

Weights: the reference's pretrained checkpoints are external downloads; the
pipeline runs with imported checkpoints when provided (infra.checkpoint) and
random initialisation otherwise (full compute path, for benchmarking and
integration tests).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.frontend import frame_audio, normalize_audio, read_wav
from ..core.flame import FlameAssets
from ..models.brain import BrainNetwork
from ..models.clip_text import ClipTextConfig, ClipTextModel
from ..models.diffusion import DiffusionPrior, NoiseScheduler
from ..models.emote import EmoteConfig, EmoteTalkingHead
from ..models.prior_transformer import PriorTransformerNetwork
from .postprocess import Intervals, apply_jaw_intervals


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    clip: ClipTextConfig = dataclasses.field(default_factory=ClipTextConfig)
    emote: EmoteConfig = dataclasses.field(default_factory=EmoteConfig)
    clip_size: int = 128
    prior_depth: int = 6
    prior_heads: int = 8  # clip_size // 16 (train_diffusion_prior.py:971)
    prior_dim_head: int = 64
    timesteps: int = 100
    cond_drop_prob: float = 0.2
    max_tokens: int = 77

    @classmethod
    def tiny(cls) -> "PipelineConfig":
        return cls(
            clip=ClipTextConfig.tiny(),
            emote=EmoteConfig.tiny(),
            clip_size=32,
            prior_depth=2,
            prior_heads=2,
            prior_dim_head=8,
            timesteps=10,
            max_tokens=16,
        )


class _HashTokenizer:
    """Deterministic fallback tokenizer (whitespace + hashing) — LAST resort.

    Only used when no vocab.json/merges.txt pair exists anywhere
    (``text.find_tokenizer_assets``) AND the caller did not require a real
    tokenizer. With random CLIP weights the exact token ids are immaterial
    (tests/bench); with real weights it would produce garbage, so
    ``load_tokenizer(require_real=True)`` refuses to fall back here.
    """

    def __init__(self, vocab_size: int, max_length: int):
        self.vocab_size = vocab_size
        self.max_length = max_length

    def __call__(self, texts):
        import zlib

        out = np.zeros((len(texts), self.max_length), dtype=np.int32)
        for i, t in enumerate(texts):
            # crc32, not hash(): Python salts hash() per process, which would
            # break cross-run reproducibility of generated styles
            ids = [1] + [
                2 + (zlib.crc32(w.encode()) % (self.vocab_size - 3))
                for w in t.lower().split()
            ]
            ids = ids[: self.max_length - 1] + [self.vocab_size - 1]
            out[i, : len(ids)] = ids
        return out


def _fold_ids(tokenize, vocab_size: int):
    """Wrap a tokenizer so out-of-range ids fold into the text tower's
    vocab (tiny/self-trained configs; ids are immaterial there, but an
    out-of-range embedding gather clamps silently on XLA). One shared
    helper so every load_tokenizer path folds identically."""
    return lambda texts: np.asarray(tokenize(texts)) % vocab_size


def load_tokenizer(
    vocab_size: int,
    max_length: int,
    *,
    assets_dir=None,
    require_real: bool = False,
):
    """CLIP tokenizer resolution, in order of preference:

    1. our offline BPE (``text.ClipBpeTokenizer``) from a local
       vocab.json+merges.txt pair (repo ``assets/clip_tokenizer/``, the
       ``AVI_TALKING_CLIP_TOKENIZER`` env var, or the HF hub cache) —
       bit-exact with HF ``CLIPTokenizer`` (tests/test_clip_tokenizer.py);
    2. HF ``CLIPTokenizer.from_pretrained(local_files_only=True)``;
    3. the hash fallback — refused when ``require_real`` (i.e. whenever real
       CLIP weights are in play; reference uses the real tokenizer at
       /root/reference/models/diffusion_prior.py:36-44).
    """
    from ..text import ClipBpeTokenizer, find_tokenizer_assets

    found = find_tokenizer_assets(assets_dir)
    if found is not None:
        tok = ClipBpeTokenizer.from_dir(found, max_length=max_length)
        if tok.vocab_size <= vocab_size:
            return tok
        if require_real:
            raise RuntimeError(
                f"CLIP tokenizer vocab ({tok.vocab_size}) exceeds the text "
                f"tower's vocab_size ({vocab_size}) — tokenizer and model "
                "checkpoint do not match."
            )
        # tiny test configs: keep the real tokenization but fold ids into
        # range (ids are immaterial with random weights; out-of-range ids
        # would NaN the embedding gather)
        return _fold_ids(tok, vocab_size)
    try:
        from transformers import CLIPTokenizer

        tok = CLIPTokenizer.from_pretrained(
            "openai/clip-vit-large-patch14", local_files_only=True
        )

        def tokenize(texts):
            enc = tok(
                texts, truncation=True, max_length=max_length,
                padding="max_length", return_tensors="np",
            )
            return enc["input_ids"].astype(np.int32)

        # same id-fold guard as the other paths: a tiny text tower must
        # not gather OpenAI-range ids (XLA clamps silently)
        return _fold_ids(tokenize, vocab_size)
    except Exception:
        pass
    if require_real:
        raise RuntimeError(
            "No CLIP tokenizer vocab found. Real CLIP weights need the "
            "real BPE tokenizer: place vocab.json + merges.txt under "
            "assets/clip_tokenizer/ (or set AVI_TALKING_CLIP_TOKENIZER)."
        )
    # 3. packaged default vocab: a real BPE learned over the caption corpus
    # (text/default_vocab, built by text.clip_bpe.learn_bpe). Proper
    # tokenization for random-weight/self-trained runs — only imported CLIP
    # checkpoints (require_real above) demand the exact OpenAI vocab.
    import os as _os

    default_dir = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "text", "default_vocab")
    if _os.path.exists(_os.path.join(default_dir, "vocab.json")):
        from ..text import ClipBpeTokenizer as _Tok

        tok = _Tok.from_dir(default_dir, max_length=max_length)
        if tok.vocab_size <= vocab_size:
            return tok
        return _fold_ids(tok, vocab_size)
    import warnings

    warnings.warn(
        "CLIP vocab not found — falling back to the hash tokenizer. "
        "Fine for random weights; WRONG for imported CLIP checkpoints.",
        stacklevel=2,
    )
    return _HashTokenizer(vocab_size, max_length)


_load_tokenizer = load_tokenizer  # backwards-compat alias


@dataclasses.dataclass
class AviTalkingPipeline:
    cfg: PipelineConfig
    clip_model: ClipTextModel
    brain: BrainNetwork
    prior: DiffusionPrior
    head: EmoteTalkingHead
    params: Dict[str, Any]  # {"clip", "brain", "prior", "head"}
    tokenizer: Any
    mesh: Any = None  # optional Mesh for data-parallel serving (use_mesh)

    # ------------------------------------------------------------------

    @classmethod
    def random_init(
        cls,
        cfg: Optional[PipelineConfig] = None,
        flame_assets: Optional[FlameAssets] = None,
        seed: int = 0,
        dtype=jnp.float32,
    ) -> "AviTalkingPipeline":
        cfg = cfg or PipelineConfig()
        rng = jax.random.PRNGKey(seed)
        r_clip, r_brain, r_prior, r_head = jax.random.split(rng, 4)

        clip_model = ClipTextModel(cfg.clip, dtype=dtype)
        clip_params = clip_model.init(
            r_clip, jnp.zeros((1, cfg.max_tokens), jnp.int32)
        )

        brain = BrainNetwork(
            out_dim=cfg.clip_size, in_dim=cfg.clip.hidden_size,
            clip_size=cfg.clip_size, dtype=dtype,
        )
        brain_params = brain.init(r_brain, jnp.zeros((1, cfg.clip.hidden_size)))

        net = PriorTransformerNetwork(
            dim=cfg.clip_size, depth=cfg.prior_depth, heads=cfg.prior_heads,
            dim_head=cfg.prior_dim_head, dtype=dtype,
        )
        prior_params = net.init(
            r_prior,
            jnp.zeros((1, 1, cfg.clip_size)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, cfg.clip_size)),
        )
        prior = DiffusionPrior(
            net=net,
            scheduler=NoiseScheduler.create(cfg.timesteps),
            text_cond_drop_prob=cfg.cond_drop_prob,
            image_cond_drop_prob=cfg.cond_drop_prob,
        )

        head = EmoteTalkingHead(cfg.emote, flame_assets=flame_assets, dtype=dtype)
        lfs = cfg.emote.flint.latent_frame_size
        dummy_audio = jnp.zeros((1, lfs, 640))
        dummy_style = jnp.zeros((1, cfg.emote.feature_dim))
        head_params = head.init(r_head, dummy_audio, style_emb=dummy_style)

        return cls(
            cfg=cfg,
            clip_model=clip_model,
            brain=brain,
            prior=prior,
            head=head,
            params={
                "clip": clip_params,
                "brain": brain_params,
                "prior": prior_params,
                "head": head_params,
            },
            tokenizer=load_tokenizer(cfg.clip.vocab_size, cfg.max_tokens),
        )

    def require_real_tokenizer(self, assets_dir=None) -> None:
        """Swap in the real CLIP BPE tokenizer (raises if no vocab exists).

        Call after grafting imported real CLIP weights into
        ``params['clip']`` (models.clip_text.clip_text_params_from_torch) —
        the hash fallback would feed them garbage ids.
        """
        self.tokenizer = load_tokenizer(
            self.cfg.clip.vocab_size,
            self.cfg.max_tokens,
            assets_dir=assets_dir,
            require_real=True,
        )

    def save(self, path: str) -> None:
        """Persist ALL pipeline params (clip/brain/prior/head) with orbax."""
        from ..infra.checkpoint import save_checkpoint

        save_checkpoint(path, self.params)

    def load(self, path: str) -> None:
        """Restore params saved by ``save`` (same configs required)."""
        from ..infra.checkpoint import restore_checkpoint

        self.params = restore_checkpoint(path, target=self.params)

    def load_prior_checkpoint(self, path: str) -> None:
        """Graft a `cli train-prior` orbax checkpoint ({"params": {brain,
        prior}, "step"}) into this pipeline's params (train -> serve)."""
        from ..infra.checkpoint import restore_checkpoint

        target = {
            "params": {
                "brain": self.params["brain"],
                "prior": self.params["prior"],
            },
            "step": jnp.zeros((), jnp.int32),
        }
        restored = restore_checkpoint(path, target=target)
        self.params = {
            **self.params,
            "brain": restored["params"]["brain"],
            "prior": restored["params"]["prior"],
        }

    # ------------------------------------------------------------------

    def use_mesh(self, mesh) -> None:
        """Enable data-parallel serving over a ``jax.sharding.Mesh``: the
        batched style-sampling and animate dispatches shard the request
        batch over the mesh's "dp" axis (params replicated; GSPMD inserts
        the collectives). Batches are padded up to a dp multiple internally,
        so any request count works. The reference has no multi-GPU
        inference at all (SURVEY.md §2.10)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.mesh = mesh
        self.params = jax.device_put(self.params, NamedSharding(mesh, P()))
        for name in ("_sample_style_fn", "_generate_fused_fn", "_animate_fn"):
            self.__dict__.pop(name, None)

    def _dp(self) -> int:
        return int(self.mesh.shape["dp"]) if self.mesh is not None else 1

    def _shard_batch(self, x):
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(x, NamedSharding(self.mesh, P("dp")))

    @functools.cached_property
    def _sample_style_fn(self):
        clip_model, brain, prior, cfg = self.clip_model, self.brain, self.prior, self.cfg

        @functools.partial(jax.jit, static_argnums=(3,))
        def sample_style(params, token_ids, rng, cond_scale=1.0):
            hidden = clip_model.apply(params["clip"], token_ids)  # (B, 77, d)
            voxel = hidden.mean(axis=1)  # driver means over tokens (:439)
            clip_voxels, _ = brain.apply(params["brain"], voxel)
            style = prior.p_sample_loop(
                params["prior"],
                (token_ids.shape[0], 1, cfg.clip_size),
                clip_voxels,
                rng,
                cond_scale=cond_scale,
            )
            return style[:, 0]  # (B, 128)

        return sample_style

    def sample_style(
        self, instruction: str | list[str], rng: jax.Array, cond_scale: float = 1.0
    ) -> jax.Array:
        texts = [instruction] if isinstance(instruction, str) else list(instruction)
        n = len(texts)
        pad = (-n) % self._dp()  # dp mesh: pad to a shardable multiple
        ids = self._shard_batch(jnp.asarray(self.tokenizer(texts + [""] * pad)))
        out = self._sample_style_fn(self.params, ids, rng, cond_scale)
        return out[:n]

    @functools.cached_property
    def _generate_fused_fn(self):
        """Whole request — CLIP -> brain -> 100-step prior -> EMOTE -> FLAME —
        as ONE jitted dispatch (measured 0.0012 RTF vs 0.011 with separate
        style/animate dispatches on the tunnel-attached v5e)."""
        clip_model, brain, prior, head, cfg = (
            self.clip_model, self.brain, self.prior, self.head, self.cfg
        )

        @functools.partial(jax.jit, static_argnums=(4, 5, 6))
        def run(params, token_ids, audio, rng, cond_scale=1.0,
                sampler="ddpm", ddim_steps=20):
            hidden = clip_model.apply(params["clip"], token_ids)
            voxel = hidden.mean(axis=1)
            clip_voxels, _ = brain.apply(params["brain"], voxel)
            shape = (token_ids.shape[0], 1, cfg.clip_size)
            if sampler == "ddim":
                style = prior.ddim_sample_loop(
                    params["prior"], shape, clip_voxels, rng,
                    steps=ddim_steps, cond_scale=cond_scale,
                )[:, 0]
            else:
                style = prior.p_sample_loop(
                    params["prior"], shape, clip_voxels, rng,
                    cond_scale=cond_scale,
                )[:, 0]
            return head.apply(params["head"], audio, style_emb=style)

        return run

    @functools.cached_property
    def _animate_fn(self):
        head = self.head

        @jax.jit
        def animate(head_params, audio_frames, style_emb, valid_len=None):
            return head.apply(
                head_params, audio_frames, style_emb=style_emb,
                valid_len=valid_len,
            )

        return animate

    # ------------------------------------------------------------------

    def generate_batch(
        self,
        wavs: list,
        instructions: list[str],
        seed: int = 0,
        cond_scale: float = 1.0,
        length_buckets: tuple = (64, 128, 256, 512),
        sample_rate: int = 16_000,
        return_vertices: bool = True,
        stage_times: Optional[Dict[str, float]] = None,
    ) -> list[Dict[str, np.ndarray]]:
        """Batched serving path: one style-sampling dispatch + one animate
        dispatch per length bucket. Clips are framed, padded to the bucket
        boundary (so each bucket compiles once) and unpadded on return.

        ``stage_times`` (optional dict) is filled with the per-stage host
        wall of THIS call in ms: ``framing_ms`` (wav decode + (T,640)
        framing), ``style_dispatch_ms`` (tokenise + async style dispatch),
        ``prep_ms`` (bucket pad/stack + H2D), ``device_fetch_ms`` (the one
        blocking sync: device compute + D2H wire together — splitting them
        would add a tunnel round trip per batch). The InferenceServer
        aggregates these plus per-request queue wait into its stats.

        Note on randomness: ONE PRNGKey(seed) covers the whole batch — the
        prior draws a single noise tensor across the batch, so the clips'
        style samples are jointly (not independently) seeded. Fine for
        serving; for diversity measurements sample each style with its own
        seed (cli diversity does).

        Padded frames are masked out of the wav2vec2 self-attention
        (``valid_len``). Note the base extractor's group norm still sees the
        padded length, so bucket-padded outputs are very close but not
        bit-equal to per-clip ``generate`` — the same padded-batching caveat
        HF documents for wav2vec2-base."""
        from ..data.batching import pad_to_bucket

        import time as _time

        assert len(wavs) == len(instructions)
        st = stage_times if stage_times is not None else {}
        lfs = self.cfg.emote.flint.latent_frame_size
        buckets = tuple(b - b % lfs for b in length_buckets)
        t0 = _time.perf_counter()
        frames_list, lens = [], []
        for wav in wavs:
            sr = sample_rate
            if isinstance(wav, str):
                wav, sr = read_wav(wav)
            f = frame_audio(wav, sr, pad_to_multiple=lfs)
            lens.append(f.shape[0])
            frames_list.append(f)
        t1 = _time.perf_counter()
        st["framing_ms"] = (t1 - t0) * 1e3

        styles = self.sample_style(instructions, jax.random.PRNGKey(seed), cond_scale)
        t2 = _time.perf_counter()
        st["style_dispatch_ms"] = (t2 - t1) * 1e3
        st["prep_ms"] = st["device_fetch_ms"] = 0.0

        results: list = [None] * len(wavs)
        by_bucket: Dict[int, list] = {}
        for i, f in enumerate(frames_list):
            fitting = [b for b in buckets if f.shape[0] <= b]
            if not fitting:
                raise ValueError(
                    f"clip {i} has {f.shape[0]} frames, larger than the "
                    f"biggest length bucket {buckets[-1]}; pass bigger "
                    f"length_buckets"
                )
            by_bucket.setdefault(fitting[0], []).append(i)
        for b, idxs in by_bucket.items():
            tb = _time.perf_counter()
            # dp mesh: pad the batch dim to a shardable multiple (extra rows
            # repeat the first clip and are never read back)
            pad_n = (-len(idxs)) % self._dp()
            pidx = idxs + [idxs[0]] * pad_n
            batch = np.stack(
                [pad_to_bucket(normalize_audio(frames_list[i]).reshape(-1, 640),
                               [b], axis=0) for i in pidx]
            )
            vl = self._shard_batch(jnp.asarray([lens[i] for i in pidx]))
            out = self._animate_fn(self.params["head"],
                                   self._shard_batch(jnp.asarray(batch)),
                                   self._shard_batch(styles[np.asarray(pidx)]),
                                   vl)
            tf = _time.perf_counter()
            st["prep_ms"] += (tf - tb) * 1e3
            # ONE D2H fetch per field, then numpy slicing per clip: on-device
            # `out[field][j, :T]` would eagerly compile a fresh
            # dynamic_slice per distinct clip length — ~0.5 s each through a
            # remote-TPU tunnel, dominating serving latency.
            # ``return_vertices=False`` additionally skips fetching the
            # (B, T, 5023, 3) vertex tensor (~100 MB per batch — THE serving
            # bottleneck on remote TPUs); coeffs alone are a few KB and
            # FLAME-decode anywhere.
            host = {k: np.asarray(v) for k, v in out.items()
                    if return_vertices or k != "vertices"}
            st["device_fetch_ms"] += (_time.perf_counter() - tf) * 1e3
            for j, i in enumerate(idxs):
                T = lens[i]
                res = {
                    "exp": host["exp"][j, :T],
                    "jaw": host["jaw"][j, :T],
                    "style_emb": host["style_emb"][j],
                    "frames": frames_list[i],
                }
                if "vertices" in host:
                    res["vertices"] = host["vertices"][j, :T]
                results[i] = res
        return results

    def generate(
        self,
        wav: np.ndarray | str,
        instruction: str,
        seed: int = 0,
        cond_scale: float = 1.0,
        intervals: Optional[Intervals] = None,
        sample_rate: int = 16_000,
        sampler: str = "ddpm",  # "ddim" = faster style sampling (see
        ddim_steps: int = 20,   # DiffusionPrior.ddim_sample_loop)
    ) -> Dict[str, np.ndarray]:
        """wav (path or float array) + instruction -> exp/jaw/vertices."""
        if isinstance(wav, str):
            wav, sample_rate = read_wav(wav)
        lfs = self.cfg.emote.flint.latent_frame_size
        frames = frame_audio(wav, sample_rate, pad_to_multiple=lfs)
        flat = normalize_audio(frames)
        audio = jnp.asarray(flat).reshape(1, frames.shape[0], frames.shape[1])

        rng = jax.random.PRNGKey(seed)
        ids = jnp.asarray(self.tokenizer([instruction]))
        out = self._generate_fused_fn(
            self.params, ids, audio, rng, cond_scale, sampler, ddim_steps
        )

        exp, jaw = out["exp"], out["jaw"]
        if intervals is not None:
            exp, jaw = apply_jaw_intervals(exp, jaw, intervals)
            if self.head.flame_assets is not None:
                from ..core.flame import FlameModel

                B, T = exp.shape[:2]
                flame = FlameModel(
                    self.head.flame_assets,
                    n_shape=self.cfg.emote.n_shape,
                    n_exp=self.cfg.emote.n_exp,
                )
                pose = jnp.concatenate([jnp.zeros_like(jaw), jaw], axis=-1)
                shape = jnp.zeros((B * T, self.cfg.emote.n_shape))
                verts = flame.vertices_only(
                    shape, exp.reshape(B * T, -1), pose.reshape(B * T, -1)
                ).reshape(B, T, -1, 3)
                out["vertices"] = verts

        result = {
            "exp": np.asarray(exp[0]),
            "jaw": np.asarray(jaw[0]),
            "style_emb": np.asarray(out["style_emb"][0]),
            "frames": frames,
        }
        if "vertices" in out:
            result["vertices"] = np.asarray(out["vertices"][0])
        return result
