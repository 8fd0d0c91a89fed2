"""avi_talking_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
audio-visual-instructed 3D talking-head synthesis.

Capabilities mirror sunyasheng/AVI-Talking (speech + natural-language
"audio-visual instruction" -> FLAME expression/jaw sequences -> 5023-vertex
meshes -> video), re-designed TPU-first:

  * all compute-path numerics are pure-functional JAX (jit/pjit-able,
    static shapes, `lax.scan` for sequential decode),
  * bfloat16-on-MXU friendly module implementations (flax.linen),
  * data parallelism + optional tensor parallelism via one
    `jax.sharding.Mesh` (see `avi_talking_tpu.parallel`),
  * host-side IO (audio decode/framing, mesh/video writing) kept off the
    device path.

Layer map (top -> bottom):
    pipeline/   wav + instruction -> style emb -> FLAME coeffs -> meshes
    models/     diffusion prior, CLIP text tower, FaceFormer AR decoders,
                EMOTE-style feed-forward decoder, FLINT motion prior
    audio/      wav2vec2 frontend (conv extractor + transformer, 50->25fps)
    core/       FLAME linear-blend-skinning, rotations, projection
    ops/        resampling, positional encodings/masks, torch-parity
                transformer blocks, pallas kernels
    data/       VOCASET / MEAD-EMOCA / caption-json loaders (host side)
    train/      jitted train steps (prior + faceformer), optimizers, metrics
    parallel/   mesh + sharding rules (dp/tp), multi-host init
    infra/      config, checkpointing (orbax + torch import), meters, profiling
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences: avi_talking_tpu.AviTalkingPipeline etc.
    if name in ("AviTalkingPipeline", "PipelineConfig"):
        from . import pipeline

        return getattr(pipeline, name)
    raise AttributeError(f"module 'avi_talking_tpu' has no attribute {name!r}")
