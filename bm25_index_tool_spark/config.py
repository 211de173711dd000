"""Global TOML configuration + BM25 parameter profiles (SURVEY.md §2.9;
reference ``config/manager.py:24-60`` and ``config/models.py:13-51``).

The reference STORES configurable k1/b but its FTS5 scorer always uses
(1.2, 0.75); our engine genuinely applies the configured values, so the
engine default stays (1.2, 0.75) — FTS5-exact rank identity — and the
reference's named profiles are available opt-in:

* ``standard`` → (1.5, 0.75)   (reference BM25Profile.STANDARD)
* ``code``     → (1.2, 0.5)    (reference BM25Profile.CODE)

Config file: ``<root>/config.toml`` (the reference uses
``~/.config/bm25-index-tool/config.toml``).  Read via stdlib ``tomllib``;
written with a minimal emitter (flat sections of scalars only) to avoid a
third-party writer dependency.  A malformed file falls back to defaults
with a warning, like the reference.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from bm25_index_tool_spark.build import BM25Params

# (k1, b) per named profile — reference config/models.py:13-31
BM25_PROFILES: dict[str, tuple[float, float]] = {
    "standard": (1.5, 0.75),
    "code": (1.2, 0.5),
}


def params_from_profile(profile: str) -> BM25Params:
    """Reference ``BM25Params.from_profile``; unknown names raise."""
    try:
        k1, b = BM25_PROFILES[profile]
    except KeyError:
        raise ValueError(
            f"unknown BM25 profile {profile!r}; expected one of {sorted(BM25_PROFILES)}"
        ) from None
    return BM25Params(k1=k1, b=b)


def validate_params(params: BM25Params) -> BM25Params:
    """Reference field constraints: k1 ∈ [0, 10], b ∈ [0, 1]."""
    if not 0.0 <= params.k1 <= 10.0:
        raise ValueError(f"k1 must be in [0, 10], got {params.k1}")
    if not 0.0 <= params.b <= 1.0:
        raise ValueError(f"b must be in [0, 1], got {params.b}")
    return params


@dataclass
class GlobalConfig:
    """Engine-wide defaults, applied when create_index gets no params."""

    default_k1: float = 1.2   # FTS5-exact engine default (see module doc)
    default_b: float = 0.75
    default_num_buckets: int = 32
    default_tokenizer_profile: str = "unicode61"
    default_embedder: str = "fake-md5"  # vector.EMBEDDERS key (plug-in seam)
    search_cache_size: int = 100
    extras: dict = field(default_factory=dict)

    def bm25_params(self) -> BM25Params:
        return validate_params(BM25Params(k1=self.default_k1, b=self.default_b))


_KNOWN = {
    "default_k1": float,
    "default_b": float,
    "default_num_buckets": int,
    "default_tokenizer_profile": str,
    "default_embedder": str,
    "search_cache_size": int,
}


def config_path(root_dir: str) -> str:
    return os.path.join(root_dir, "config.toml")


def load_config(root_dir: str) -> GlobalConfig:
    """Load ``<root>/config.toml``; missing file or parse error → defaults
    (reference ``ConfigManager.load_config`` behavior)."""
    import tomllib

    p = config_path(root_dir)
    if not os.path.exists(p):
        return GlobalConfig()
    try:
        with open(p, "rb") as f:
            data = tomllib.load(f)
    except (tomllib.TOMLDecodeError, OSError):
        import warnings

        warnings.warn(f"Failed to parse {p}; using defaults", stacklevel=2)
        return GlobalConfig()
    cfg = GlobalConfig()
    extras = {}
    for k, v in data.items():
        if k in _KNOWN:
            try:
                setattr(cfg, k, _KNOWN[k](v))
            except (TypeError, ValueError):
                extras[k] = v
        else:
            extras[k] = v
    cfg.extras = extras
    return cfg


def save_config(root_dir: str, cfg: GlobalConfig) -> str:
    """Minimal TOML emitter for the flat scalar config."""
    os.makedirs(root_dir, exist_ok=True)
    p = config_path(root_dir)
    lines = []
    for k in _KNOWN:
        v = getattr(cfg, k)
        lines.append(f'{k} = "{v}"' if isinstance(v, str) else f"{k} = {v}")
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(tmp, p)
    return p
