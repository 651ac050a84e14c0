from .collators import (SFTCollator, LongDataCollator, LongCoTCollator,
                        ShareGPTCollator, DPOCollator, pack_documents)
from .dataset import MappingDataset, MultiMappingDataset, add_id_aligner, concat_aligner
