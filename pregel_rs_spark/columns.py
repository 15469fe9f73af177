"""Column-naming convention for the Pregel engine.

Parity with the reference's ``Column`` enum and helpers
(/root/reference/src/pregel.rs:11-148): user programs are written against a
namespaced flat-column convention — inside the triplet frame the subject
vertex's columns appear as ``subject.*``, the edge's as ``edge.*``, the
object vertex's as ``object.*``, and the aggregated message as
``_pregel_msg_``.

In Spark we implement the namespace with literal dotted column names
(referenced via backticks), which keeps everything inside Catalyst — no
struct packing, no UDFs.  ``F.col("`subject.rank`")`` is a plain top-level
column whose name contains a dot.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- canonical column names (pregel.rs:49-62) --------------------------------
VERTEX_ID = "vertex_id"   # id column of the vertices frame
SUBJECT = "subject"       # edge source-id column
PREDICATE = "predicate"   # reserved in the reference, unused (pregel.rs:54)
OBJECT = "object"         # edge destination-id column
EDGE = "edge"             # namespace prefix for edge columns in the triplet
MSG = "msg"               # namespace prefix for message columns
PREGEL_MSG = "_pregel_msg_"  # the aggregated-message column seen by v_prog


def alias(prefix: str, column: str) -> str:
    """``"{prefix}.{column}"`` — the namespacing scheme (pregel.rs:65-67)."""
    return f"{prefix}.{column}"


def _qcol(name: str) -> Column:
    """Reference a column whose literal name may contain dots."""
    return F.col(f"`{name}`")


def subject(column: str = VERTEX_ID) -> Column:
    """``col("subject.{column}")`` — subject-vertex attr in the triplet
    (pregel.rs:85-87)."""
    return _qcol(alias(SUBJECT, column))


def object_(column: str = VERTEX_ID) -> Column:
    """``col("object.{column}")`` — object-vertex attr in the triplet
    (pregel.rs:105-107)."""
    return _qcol(alias(OBJECT, column))


def edge_(column: str) -> Column:
    """``col("edge.{column}")`` — edge attr in the triplet
    (pregel.rs:124-126)."""
    return _qcol(alias(EDGE, column))


def msg(column: str | None = None) -> Column:
    """``col("_pregel_msg_")`` or ``col("msg.{column}")``
    (pregel.rs:143-148)."""
    if column is None:
        return _qcol(PREGEL_MSG)
    return _qcol(alias(MSG, column))
