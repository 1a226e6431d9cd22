from gru4rec_tpu.data.tools import sort_if_needed, compute_offset
from gru4rec_tpu.data.loader import load_data
from gru4rec_tpu.data.scheduler import Schedule, build_schedule

__all__ = ["sort_if_needed", "compute_offset", "load_data", "Schedule", "build_schedule"]
