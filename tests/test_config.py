"""Config system tests: defaults, JSON coercion, reference option-file parity."""

import json

from dune_transformercvn_tpu.config import Options


def test_defaults_match_reference():
    o = Options()
    assert o.hidden_dim == 128
    assert o.densenet_structure == [6, 12, 24, 16]
    assert o.learning_rate_cycles == 1
    assert o.train_validation_split == 0.95
    assert o.loss_gamma == 0.0
    assert o.transformer_norm_first is False


def test_json_coercion(tmp_path):
    # Option files store some booleans as 0/1 and ints may arrive as floats.
    path = tmp_path / "opts.json"
    path.write_text(json.dumps({
        "verbose_output": 1,
        "one_hot_pixels": 0,
        "batch_size": 16.0,
        "hidden_dim": "128",
        "custom_extra_key": [1, 2],
    }))
    o = Options.load(str(path))
    assert o.verbose_output is True
    assert o.one_hot_pixels is False
    assert o.batch_size == 16 and isinstance(o.batch_size, int)
    assert o.hidden_dim == 128
    assert o.custom_extra_key == [1, 2]  # unknown keys pass through


def test_production_option_file_loads():
    o = Options.load("option_files/fdhd_beam_2018prod_2023_08_07.json")
    assert o.densenet_structure == [3, 6, 12, 6, 3]
    assert o.densenet_growth_rate == 32
    assert o.num_encoder_layers == 6
    assert o.event_prong_loss_proportion == 0.9
    assert o.loss_gamma == 1.0
    assert o.event_current_targets is True
    assert o.disable_smart_features is True
    assert o.num_gpu == 4
    assert o.verbose_output is True


def test_tutorial_option_file_loads():
    o = Options.load("option_files/fdhd_beam_2018prod_aiml_tutorial_2025_04_21.json")
    assert o.batch_size == 2
    assert o.num_gpu == 1
    assert o.learning_rate_warmup_epochs == 0.01
    assert o.train_validation_split == 0.96


def test_save_round_trip(tmp_path):
    o = Options()
    o.batch_size = 7
    path = tmp_path / "dump.json"
    o.save(str(path))
    o2 = Options.load(str(path))
    assert o2.batch_size == 7
    assert o2.to_dict() == o.to_dict()
