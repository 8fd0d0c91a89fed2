from .captions import CaptionDataset, MeadFilenameParser, MEAD_TRAINING_IDS
from .stats import CoeffStats
from .vocaset import VocasetDataset, VOCASET_SPLITS
from .mead import MeadEmocaDataset
from .splits import MEAD_IDENTITIES, identity_of, mead_identity_split
from .caption_gen import TalkClipGenerator
from .batching import batch_iterator, pad_to_bucket
