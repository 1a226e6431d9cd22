from gru4rec_tpu.io.checkpoint import save_model, load_model

__all__ = ["save_model", "load_model"]
