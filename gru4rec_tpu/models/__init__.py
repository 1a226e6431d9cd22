from gru4rec_tpu.models.gru4rec import GRU4Rec

__all__ = ["GRU4Rec"]
