# Sample RSC15 config: cross-entropy (softmax), GRU-100, no embedding, no logq
# (reference: param_samples/rsc15_cross-entropy.py; expected R@20≈0.7180,
# MRR@20≈0.3087 per examples/rsc15/run_rsc15.py in the reference).
from collections import OrderedDict

gru4rec_params = OrderedDict([
    ('layers', [100]), ('loss', 'cross-entropy'), ('final_act', 'softmax'),
    ('hidden_act', 'tanh'), ('adapt', 'adagrad'), ('n_epochs', 10),
    ('batch_size', 32), ('dropout_p_embed', 0.0), ('dropout_p_hidden', 0.3),
    ('learning_rate', 0.1), ('momentum', 0.7), ('sample_alpha', 0.0),
    ('n_sample', 2048), ('logq', 0.0), ('constrained_embedding', False),
])
