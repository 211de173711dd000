"""Global TOML config + BM25 profile tests (reference config/manager.py,
config/models.py semantics)."""

from __future__ import annotations

import pytest

from bm25_index_tool_spark.build import BM25Params
from bm25_index_tool_spark.config import (
    GlobalConfig,
    load_config,
    params_from_profile,
    save_config,
    validate_params,
)


def test_profiles_match_reference():
    assert params_from_profile("standard").__dict__ == {"k1": 1.5, "b": 0.75}
    assert params_from_profile("code").__dict__ == {"k1": 1.2, "b": 0.5}
    with pytest.raises(ValueError, match="unknown BM25 profile"):
        params_from_profile("nope")


def test_param_validation_ranges():
    validate_params(BM25Params(k1=0.0, b=0.0))
    validate_params(BM25Params(k1=10.0, b=1.0))
    with pytest.raises(ValueError, match="k1"):
        validate_params(BM25Params(k1=10.5, b=0.5))
    with pytest.raises(ValueError, match="b must"):
        validate_params(BM25Params(k1=1.2, b=1.5))


def test_config_roundtrip_and_defaults(tmp_path):
    root = str(tmp_path)
    # missing file → defaults (FTS5-exact engine default, not 'standard')
    cfg = load_config(root)
    assert cfg.bm25_params().__dict__ == {"k1": 1.2, "b": 0.75}
    assert cfg.default_num_buckets == 32

    cfg.default_k1 = 1.5
    cfg.default_num_buckets = 8
    save_config(root, cfg)
    got = load_config(root)
    assert got.default_k1 == 1.5 and got.default_num_buckets == 8

    # malformed file → defaults, with a warning (reference behavior)
    with open(f"{root}/config.toml", "w") as f:
        f.write("not [valid toml")
    with pytest.warns(UserWarning, match="Failed to parse"):
        assert load_config(root).default_k1 == 1.2


def test_unknown_keys_preserved_as_extras(tmp_path):
    root = str(tmp_path)
    with open(f"{root}/config.toml", "w") as f:
        f.write('default_k1 = 2.0\ncustom_flag = "x"\n')
    cfg = load_config(root)
    assert cfg.default_k1 == 2.0
    assert cfg.extras == {"custom_flag": "x"}


def test_client_uses_config_defaults(spark, tmp_path):
    from bm25_index_tool_spark import corpus as C
    from bm25_index_tool_spark.client import BM25SparkClient

    root = str(tmp_path / "root")
    save_config(root, GlobalConfig(default_num_buckets=4, default_k1=1.5))
    client = BM25SparkClient(spark, root)
    rows = C.generate_rows(10, seed=2)
    m = client.create_index("cfg", spark.createDataFrame(rows, C.CORPUS_SCHEMA))
    assert m.num_buckets == 4
    assert m.params.k1 == 1.5
    # explicit args still win
    m2 = client.create_index(
        "cfg2", spark.createDataFrame(rows, C.CORPUS_SCHEMA),
        params=BM25Params(k1=0.9, b=0.4), num_buckets=2,
    )
    assert m2.num_buckets == 2 and m2.params.k1 == 0.9


def test_cli_partial_k1_keeps_configured_b(spark, tmp_path):
    """ADVICE r02: `create --k1 2.0` with default_b in config.toml must use
    the configured b, not the hardcoded 0.75."""
    from bm25_index_tool_spark import build as B
    from bm25_index_tool_spark import corpus as C
    from bm25_index_tool_spark.cli import main

    root = str(tmp_path / "root")
    save_config(root, GlobalConfig(default_k1=1.9, default_b=0.5,
                                   default_num_buckets=4))
    corpus_path = str(tmp_path / "corpus.parquet")
    spark.createDataFrame(
        C.generate_rows(8, seed=3), C.CORPUS_SCHEMA
    ).write.parquet(corpus_path)

    assert main(["--root", root, "create", "cfg", "--corpus", corpus_path,
                 "--k1", "2.0"]) in (0, None)
    m = B.load_manifest(f"{root}/indices/cfg")
    assert m.params.k1 == 2.0
    assert m.params.b == 0.5  # from config.toml, not the 0.75 literal

    assert main(["--root", root, "create", "cfg2", "--corpus", corpus_path,
                 "--b", "0.6"]) in (0, None)
    m2 = B.load_manifest(f"{root}/indices/cfg2")
    assert m2.params.k1 == 1.9 and m2.params.b == 0.6
