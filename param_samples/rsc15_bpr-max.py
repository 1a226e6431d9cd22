# Sample RSC15 config: BPR-max, GRU-100, no embedding
# (reference: param_samples/rsc15_bpr-max.py; expected R@20≈0.7197, MRR@20≈0.3157
# per examples/rsc15/run_rsc15.py:24 in the reference).
from collections import OrderedDict

gru4rec_params = OrderedDict([
    ('layers', [100]), ('loss', 'bpr-max'), ('final_act', 'elu-0.5'),
    ('hidden_act', 'tanh'), ('adapt', 'adagrad'), ('n_epochs', 10),
    ('batch_size', 32), ('dropout_p_embed', 0.0), ('dropout_p_hidden', 0.0),
    ('learning_rate', 0.2), ('momentum', 0.3), ('sample_alpha', 0.0),
    ('n_sample', 2048), ('bpreg', 1.0), ('constrained_embedding', False),
])
