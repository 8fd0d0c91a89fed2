from . import torch_compat  # noqa: F401
# checkpoint/config/meters/emote_import are imported lazily by consumers to
# avoid a circular import through audio.import_hf
