from gru4rec_tpu.eval.evaluation import evaluate, evaluate_gpu, evaluate_sessions

__all__ = ["evaluate", "evaluate_gpu", "evaluate_sessions"]
