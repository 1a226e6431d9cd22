from gru4rec_tpu.ops.activations import get_activation, masked_softmax
from gru4rec_tpu.ops.losses import get_loss
from gru4rec_tpu.ops.sampling import popularity_cdf, sample_negatives

__all__ = ["get_activation", "masked_softmax", "get_loss", "popularity_cdf", "sample_negatives"]
