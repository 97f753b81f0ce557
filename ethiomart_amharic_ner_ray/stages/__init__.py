"""Ray Data stages.

Stateless per-batch functions (plain callables → Ray tasks) and stateful
callable classes (→ actor pools via ``map_batches(Cls, concurrency=N)``).
All hot-path stages take and return ``pyarrow.Table`` (zero-copy blocks).
"""

from .normalize import make_normalizer  # noqa: F401
from .extract import RegexExtractor, derive_seller  # noqa: F401
from .ner_scorer import NerScorer  # noqa: F401
from .linker import EntityLinker, build_product_index  # noqa: F401
