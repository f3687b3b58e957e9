"""The embedder family must survive the run dir round trip: a non-dense
training run's options.json records it, so evaluate.py / export.py rebuild
the correct architecture without re-passing CLI flags (the reference
encodes the family in the trainer subclass; our CLI flag must not be
needed twice)."""

import json
import os
import tempfile

import numpy as np

from dune_transformercvn_tpu.config import Options
from dune_transformercvn_tpu.data.schema import make_synthetic_file
from dune_transformercvn_tpu.train import Trainer


def tiny_options():
    options = Options()
    options.densenet_structure = [1, 1]
    options.densenet_growth_rate = 8
    options.initial_pixel_dim = 8
    options.pixel_embedding_dim = 16
    options.feature_embedding_dim = 8
    options.position_embedding_dim = 8
    options.hidden_dim = 32
    options.num_encoder_layers = 1
    options.num_prong_decoder_layers = 2
    options.num_attention_heads = 4
    options.compute_dtype = "float32"
    options.event_current_targets = True
    options.batch_size = 2
    options.coo_bucket_granularity = 512
    options.train_validation_split = 0.8
    options.verbose_output = False
    path = os.path.join(tempfile.gettempdir(), "embedder_persist.h5")
    if not os.path.exists(path):
        make_synthetic_file(path, num_events=10, seed=2)
    options.training_file = path
    return options


def test_embedder_family_recorded_and_reloaded(tmp_path):
    run_dir = str(tmp_path / "version_0")
    os.makedirs(run_dir)
    trainer = Trainer(tiny_options(), embedder="coo", run_dir=run_dir)
    assert trainer.model_config.embedder == "coo"

    recorded = json.load(open(os.path.join(run_dir, "options.json")))
    assert recorded["embedder"] == "coo"

    # the evaluate.py / export.py flow: rebuild purely from options.json
    reloaded = Trainer(
        Options.load(os.path.join(run_dir, "options.json")),
        run_dir=None, debug=True,
    )
    assert reloaded.model_config.embedder == "coo"
    # same param-tree structure -> checkpoints restore into the right model
    import jax

    keys_a = jax.tree_util.tree_structure(jax.device_get(trainer.state.params))
    keys_b = jax.tree_util.tree_structure(jax.device_get(reloaded.state.params))
    assert keys_a == keys_b
