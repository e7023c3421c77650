"""Query plans: the engine's canonical query set.

Importing this package populates the registry with every implemented
query (Spark impl + DuckDB oracle SQL). `__spark_entry__.py` re-exports
the registry for the driver's correctness gate.
"""

from . import registry  # noqa: F401
from . import queries_words  # noqa: F401
from . import queries_relational  # noqa: F401
from . import queries_operators  # noqa: F401
from . import queries_sources  # noqa: F401
from . import queries_textstats  # noqa: F401
from . import queries_dedup  # noqa: F401
from . import queries_similarity  # noqa: F401
from . import queries_events  # noqa: F401
from . import queries_setops  # noqa: F401
from . import queries_extras  # noqa: F401
from . import queries_windows  # noqa: F401
from . import queries_sampling  # noqa: F401
from . import queries_tpch  # noqa: F401
from . import queries_tpch_gen  # noqa: F401
from . import queries_snapshot  # noqa: F401

__all__ = ["registry"]
