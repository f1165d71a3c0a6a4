"""Deterministic id minting.

The reference uses MySQL AUTO_INCREMENT surrogate ids
(/root/reference/chengyu/create_table_chengyu.py:20), which are
arrival-order-dependent — not reproducible across cluster sizes. We mint
``node_id = xxhash64(entity_type, name)`` instead (SURVEY.md §1.2): pure
column expression, stable under any parallelism, collision probability
~n²/2⁶⁵ (negligible at 10⁹ nodes; a uniqueness assertion runs in tests).
``monotonically_increasing_id`` is banned for the same reason.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def node_id(entity_type: Column | str, name: Column | str) -> Column:
    et = F.col(entity_type) if isinstance(entity_type, str) else entity_type
    nm = F.col(name) if isinstance(name, str) else name
    return F.xxhash64(et, nm)
