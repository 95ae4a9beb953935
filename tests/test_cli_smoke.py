"""Every CLI must import and parse its flags (catches arg/import rot for
entry points not exercised elsewhere in CI)."""

import importlib

import pytest

CLIS = [
    "mst_tpu.cli.train",
    "mst_tpu.cli.train_style_transfer",
    "mst_tpu.cli.train_separation",
    "mst_tpu.cli.validate_retrieval",
    "mst_tpu.cli.inference_e2e_style_transfer",
    "mst_tpu.cli.test_tcn_style_transfer",
    "mst_tpu.cli.grid_search_tcn",
    "mst_tpu.cli.select_distinctive_pairs",
    "mst_tpu.cli.run_distinctive_pairs_transfer",
    "mst_tpu.cli.create_balanced_subset",
    "mst_tpu.cli.check_dataset",
    "mst_tpu.cli.preprocess_separation",
    "mst_tpu.cli.extract_song_identity",
    "mst_tpu.cli.demix",
    "mst_tpu.cli.train_fx_encoder",
    "mst_tpu.cli.style_resolution",
    "mst_tpu.cli.make_synth_corpus",
    "mst_tpu.cli.probe_song_identity",
    "mst_tpu.cli.remove_song_identity",
    "mst_tpu.cli.effects_transfer",
]


@pytest.mark.parametrize("mod", CLIS)
def test_cli_imports_and_parses_help(mod, capsys):
    m = importlib.import_module(mod)
    assert hasattr(m, "get_params") and hasattr(m, "main")
    with pytest.raises(SystemExit) as e:
        m.get_params(["--help"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "--" in out  # help text printed


@pytest.mark.parametrize("mod", [c for c in CLIS if c != "mst_tpu.cli.extract_song_identity"])
def test_cli_rejects_unknown_flag(mod):
    m = importlib.import_module(mod)
    with pytest.raises(SystemExit) as e:
        m.get_params(["--definitely_not_a_flag", "1"])
    assert e.value.code != 0
