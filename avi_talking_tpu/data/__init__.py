from .captions import CaptionDataset, MeadFilenameParser, MEAD_TRAINING_IDS
from .stats import CoeffStats
from .vocaset import VocasetDataset, VOCASET_SPLITS
from .mead import MeadEmocaDataset
from .batching import batch_iterator, pad_to_bucket
