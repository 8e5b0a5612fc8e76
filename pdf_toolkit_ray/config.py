"""Extraction configuration: frozen dataclass + YAML precedence.

Mirrors the reference's config system semantics:

* fixed schema, unknown keys rejected (``src/pdf-toolkit/config.py:100-111``),
* precedence defaults < YAML < explicit overrides (``src/pdf-toolkit/cli.py:90-110``),
* all range/enum validation up-front with clear errors, the analog of
  ``_validate_options`` (``src/pdf-toolkit/page_images.py:31-115``).

The knobs generalize the reference's page-image knobs
(``src/pdf-toolkit/config.py:19-48``): pixel thresholds become text-density
thresholds, pixel paddings become node paddings, the outer-black-bar
detector's hysteresis parameters keep their names and defaults where the
analogy is direct.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from typing import Any, Mapping

from . import UserError

SYMMETRY_STRATEGIES = ("independent", "match_max_width", "mirror_from_gutter")
OUTER_MARGIN_MODES = ("off", "fixed", "auto")
HTML_STRATEGIES = ("density", "justext")


@dataclasses.dataclass(frozen=True)
class ExtractConfig:
    # --- pdf / layout knobs (analog of spread/gutter handling) ---
    split_ratio: float = 1.25          # detect_spread: width/height >= ratio (page_images.py:118-123)
    gutter_search_frac: float = 0.35   # center window for gutter search (page_images.py:126-172)
    gutter_trim_px: int = 0            # trim around gutter (page_images.py:175-202)
    symmetry_strategy: str = "independent"  # page_images.py:467-543 analog

    # --- html density scoring (find_crop_bbox analog, page_images.py:320-407) ---
    density_threshold: float = 0.5     # crop_threshold analog, on [0,1] score scale
    tag_cost: float = 4.0              # chars of "tag ink" per markup tag in density
    bp_penalty: float = 0.2            # score multiplier for boilerplate-tagged nodes
    min_area_frac: float = 0.25        # fallback-to-full-doc cutoff (page_images.py:352-355)
    pad_nodes: int = 0                 # pad_px analog: neighbor nodes kept around region
    edge_inset_nodes: int = 0          # edge_inset_px analog

    # --- alternate html main-content strategy ---
    # density: the crop-mask analog above (default, gold-recovery pinned).
    # justext: jusText-style paragraph CLASSIFICATION (Pomikálek 2011):
    # context-free good/near-good/short/bad per block from length,
    # stopword density and link density, then a context pass that
    # resolves short/near-good against the nearest decided neighbors.
    html_strategy: str = "density"
    jt_length_low: int = 70            # chars: below => "short" block
    jt_length_high: int = 200          # chars: stopword-rich above => good outright
    jt_stopwords_low: float = 0.30     # stopword density for near-good
    jt_stopwords_high: float = 0.32    # stopword density for good
    jt_max_link_density: float = 0.2   # above => bad regardless of the rest

    # --- boilerplate-run clamp (outer black bar analog, page_images.py:205-317) ---
    outer_margin_mode: str = "off"     # off|fixed|auto
    outer_margin_fixed_nodes: int = 0  # used when mode == fixed
    outer_margin_auto_max_frac: float = 0.5   # cap on clamped nodes, as frac of node count
    outer_margin_auto_search_frac: float = 0.5
    bp_enter_cutoff: float = 0.60      # dark_frac_cutoff analog (boilerplate-ness to enter a bar)
    bp_release_frac: float = 0.35      # release_frac analog
    bp_min_run: int = 2                # min_run_px analog (consecutive clean nodes to release)
    outer_margin_pad_nodes: int = 0    # outer_margin_pad_px analog

    # --- distributed execution knobs ---
    n_parts: int = 64                  # output partitions (hash(conv_id) % n_parts)
    exchange: str = "mr"               # mr (ray-core hash exchange) | sort (Dataset.groupby)
    salt_threshold: int = 100_000      # convs with more turns than this get salted splits
    salt_width: int = 50_000           # turns per salt chunk: salt = turn_idx // salt_width
    batch_size: int = 32768            # rows per extraction batch/task
    extract_concurrency: Any = None    # actor pool size; None = let Ray autoscale
    # two-level exchange: None = auto (on when blocks*slots exceeds
    # exchange_max_objects), True/False = force. exchange_wave bounds how
    # many map shards a mid-level merge task consumes (driver ref lists and
    # reducer arg lists stay O(blocks/wave) instead of O(blocks)).
    exchange_two_level: Any = None
    exchange_wave: int = 32
    exchange_max_objects: int = 100_000

    def __post_init__(self) -> None:
        if self.split_ratio <= 0:
            raise UserError("split_ratio must be > 0.")
        if not (0 < self.gutter_search_frac <= 1):
            raise UserError("gutter_search_frac must be in (0, 1].")
        if self.gutter_trim_px < 0:
            raise UserError("gutter_trim_px must be >= 0.")
        if self.symmetry_strategy not in SYMMETRY_STRATEGIES:
            raise UserError(
                "symmetry_strategy must be one of: independent, match_max_width, "
                "mirror_from_gutter."
            )
        if not (0 <= self.density_threshold <= 1):
            raise UserError("density_threshold must be in the range [0, 1].")
        if self.tag_cost < 0:
            raise UserError("tag_cost must be >= 0.")
        if not (0 < self.bp_penalty <= 1):
            raise UserError("bp_penalty must be in (0, 1].")
        if not (0 < self.min_area_frac <= 1):
            raise UserError("min_area_frac must be in the range (0, 1].")
        if self.pad_nodes < 0:
            raise UserError("pad_nodes must be >= 0.")
        if self.edge_inset_nodes < 0:
            raise UserError("edge_inset_nodes must be >= 0.")
        if self.html_strategy not in HTML_STRATEGIES:
            raise UserError("html_strategy must be one of: density, justext.")
        if not (0 < self.jt_length_low <= self.jt_length_high):
            raise UserError("need 0 < jt_length_low <= jt_length_high.")
        if not (0 <= self.jt_stopwords_low <= self.jt_stopwords_high <= 1):
            raise UserError("need 0 <= jt_stopwords_low <= jt_stopwords_high <= 1.")
        if not (0 <= self.jt_max_link_density <= 1):
            raise UserError("jt_max_link_density must be in [0, 1].")
        if self.outer_margin_mode not in OUTER_MARGIN_MODES:
            raise UserError("outer_margin_mode must be one of: off, fixed, auto.")
        if self.outer_margin_fixed_nodes < 0:
            raise UserError("outer_margin_fixed_nodes must be >= 0.")
        if not (0 < self.outer_margin_auto_max_frac <= 1):
            raise UserError("outer_margin_auto_max_frac must be in (0, 1].")
        if not (0 < self.outer_margin_auto_search_frac <= 1):
            raise UserError("outer_margin_auto_search_frac must be in (0, 1].")
        if not (0 <= self.bp_release_frac <= self.bp_enter_cutoff <= 1):
            raise UserError("need 0 <= bp_release_frac <= bp_enter_cutoff <= 1.")
        if self.bp_min_run <= 0:
            raise UserError("bp_min_run must be a positive integer.")
        if self.outer_margin_pad_nodes < 0:
            raise UserError("outer_margin_pad_nodes must be >= 0.")
        if self.n_parts <= 0:
            raise UserError("n_parts must be a positive integer.")
        if self.exchange not in ("mr", "sort"):
            raise UserError("exchange must be one of: mr, sort.")
        if self.salt_threshold <= 0:
            raise UserError("salt_threshold must be a positive integer.")
        if self.salt_width <= 0:
            raise UserError("salt_width must be a positive integer.")
        if self.batch_size <= 0:
            raise UserError("batch_size must be a positive integer.")
        if self.exchange_wave <= 1:
            raise UserError("exchange_wave must be > 1.")
        if self.exchange_max_objects <= 0:
            raise UserError("exchange_max_objects must be a positive integer.")

    def config_hash(self) -> str:
        """Stable digest of the semantic knobs — recorded in partition manifests."""
        payload = {
            k: v
            for k, v in dataclasses.asdict(self).items()
            if k not in ("batch_size", "extract_concurrency", "exchange_two_level",
                         "exchange_wave", "exchange_max_objects")
        }
        return hashlib.sha256(
            json.dumps(payload, sort_keys=True).encode()
        ).hexdigest()[:16]


_FIELD_NAMES = {f.name for f in dataclasses.fields(ExtractConfig)}


def deep_merge(base: Mapping[str, Any], override: Mapping[str, Any]) -> dict[str, Any]:
    """Recursive dict merge, override wins (reference config.py deep_merge analog)."""
    out: dict[str, Any] = dict(base)
    for key, value in override.items():
        if (
            key in out
            and isinstance(out[key], Mapping)
            and isinstance(value, Mapping)
        ):
            out[key] = deep_merge(out[key], value)
        else:
            out[key] = value
    return out


def validate_keys(options: Mapping[str, Any]) -> None:
    unknown = sorted(set(options) - _FIELD_NAMES)
    if unknown:
        raise UserError(f"Unknown config keys: {', '.join(unknown)}")


def load_config(
    yaml_path: str | None = None, overrides: Mapping[str, Any] | None = None
) -> ExtractConfig:
    """defaults < YAML < explicit overrides (reference cli.py:90-110 precedence)."""
    merged: dict[str, Any] = {}
    if yaml_path is not None:
        import yaml  # PyYAML is stdlib-adjacent; present in the sandbox

        with open(yaml_path) as fh:
            loaded = yaml.safe_load(fh) or {}
        if not isinstance(loaded, Mapping):
            raise UserError("config YAML root must be a mapping.")
        # accept either a bare mapping or one wrapped in an `extract:` section,
        # like the reference accepts wrapped/root sections (cli.py/config.py)
        if "extract" in loaded and isinstance(loaded["extract"], Mapping):
            loaded = loaded["extract"]
        merged = deep_merge(merged, loaded)
    if overrides:
        merged = deep_merge(merged, overrides)
    validate_keys(merged)
    return ExtractConfig(**merged)
