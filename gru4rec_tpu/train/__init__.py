from gru4rec_tpu.train.optimizers import make_optimizer, dedup_rows

__all__ = ["make_optimizer", "dedup_rows"]
