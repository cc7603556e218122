from rlipv2_tpu.data.collate import make_hoi_batch
from rlipv2_tpu.data.text import merge_batch_texts, pack_text_slots

__all__ = ["make_hoi_batch", "merge_batch_texts", "pack_text_slots"]
