"""pdf_toolkit_ray — a Ray-Data-native per-turn content-extraction engine.

From-scratch generalization of duck-lint/PDF-toolkit's page-prep stages
(spread detect/split, rotation normalization, crop/cleanup) into per-turn
main-content extraction over Parquet transcript tables:

* byte-stream sniffing per turn (`html` | `pdf` | `plain`),
* HTML boilerplate stripping via text-density DOM scoring (Arc90/jusText
  style; mirrors ``find_crop_bbox`` semantics, reference
  ``src/pdf-toolkit/page_images.py:320-407``),
* mini-PDF layout parse (rotation normalization ``(r+d)%360`` analog of
  ``src/pdf-toolkit/rotate.py:112``, spread split analog of
  ``src/pdf-toolkit/page_images.py:118-202``, reading-order sort),

all expressed as ``ray.data.Dataset`` pipelines: zero-copy Arrow
``map_batches`` with actor pools for the stateful extraction stage,
hash(conv_id) partitioning with salted splits for heavy conversations,
and per-partition checkpoint manifests for resumable runs.

Nothing here calls ``ray.init``/``ray.shutdown`` — the session is owned
by the caller (driver / bench.py / test fixture).
"""

__version__ = "0.1.0"

FIXTURE_VERSION = 1


class UserError(ValueError):
    """Invalid user input / configuration (reference: utils.py:14-15)."""
