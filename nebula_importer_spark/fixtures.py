"""Reference golden fixtures: CSV lines + mapping specs for parity replay.

Data and spec shapes transcribed from the reference's example corpus
(``/root/reference/examples/basic/person.csv``, ``knows.csv``) and mapping
config (``examples/basic/basic.string.insert.v3.yaml:30-150``). These drive
the parity tests (triples P/R vs the reference row→graph mapping) and the
document-pathway replay (fixture lines embedded as ``table_row`` spans,
FIXTURES.md §1).
"""

from __future__ import annotations

from nebula_importer_spark.plans.specs import EdgeSpec, NodeIDSpec, NodeSpec, PropSpec, RankSpec

# examples/basic/person.csv (delimiter "|", comment "#") — comments stripped
PERSON_CSV_LINES: tuple[str, ...] = (
    "933|Mahinda|Perera|male|1989-12-03|2010-02-14T15:32:10|119.235.7.103|Firefox",
    "1129|Carmen|Lepland|female|1984-02-18|2010-01-28T06:39:58|195.20.151.175|Internet Explorer",
    "2199023256684|A.|Rao|female|1985-08-02|2010-04-23T22:52:26|49.202.188.25|Firefox",
    "4398046512167|Gustavo|Arbelaez|male|1986-11-02|2010-06-16T20:53:47|190.96.189.165|Chrome",
    "6597069767117|Eli|Peretz|female|1989-01-18|2010-07-23T12:55:52|41.92.31.35|Internet Explorer",
    "10995116278700|Joseph|Anderson|female|1986-01-07|2010-11-06T05:06:52|24.49.203.161|Firefox",
    "17592186045684|Michael|Li|male|1983-04-20|2011-06-05T01:41:59|1.50.202.121|Firefox",
    "21990232556027|Yacine|Abdelli|male|1988-07-26|2011-10-30T03:42:11|82.101.132.47|Firefox",
    "21990232556585|Faisal|Malik|male|1981-02-02|2011-10-23T21:12:23|202.163.114.175|Chrome",
    "24189255812290|Manuel|Alvarez||1985-12-27|2011-11-13T07:28:40|168.165.167.25|Firefox",
    "26388279066636|Jose|Alonso|female|_NULL_|2012-02-15T13:41:01|196.1.135.241|Internet Explorer",
    "28587302322727|Steve|Moore|male|1981-08-28|2012-03-23T00:44:07|18.250.105.113|",
)

# examples/basic/knows.csv (delimiter ",")
KNOWS_CSV_LINES: tuple[str, ...] = (
    "933,2199023256684,2010-04-22T12:30:57",
    "933,10995116278700,2010-11-15T07:23:49",
    "933,21990232556027,2011-12-15T02:34:43",
    "1129,21990232556027,2010-04-13T16:44:22",
    "1129,10995116278700,2011-01-02T22:39:28",
    "1129,4398046512167,2011-09-17T21:40:17",
    "1129,6597069767117,2012-01-19T19:21:54",
    "21990232556027,6597069767117,2012-04-15T04:24:28",
    "6597069767117,4398046512167,2012-05-29T18:00:10",
)

_PERSON_PROPS = [
    PropSpec("firstName", "STRING", 1),
    PropSpec("lastName", "STRING", 2),
    PropSpec("gender", "STRING", 3, nullable=True, default_value="female"),
    PropSpec("birthday", "DATE", 4, nullable=True, null_value="_NULL_"),
    PropSpec("creationDate", "DATETIME", 5),
    PropSpec("locationIP", "STRING", 6),
    PropSpec("browserUsed", "STRING", 7),
]


def person_spec() -> NodeSpec:
    """Tag Person, string VID from col 0 (basic.string.insert.v3.yaml:38-66)."""
    return NodeSpec(
        name="Person",
        id=NodeIDSpec(type="STRING", index=0),
        props=[PropSpec(**{**vars(p)}) for p in _PERSON_PROPS],
    )


def person_concat_spec() -> NodeSpec:
    """Tag Person with concat VID + filter (basic.string.insert.v3.yaml:67-104)."""
    return NodeSpec(
        name="Person",
        id=NodeIDSpec(type="STRING", concat_items=["person_", 0, "_id"]),
        props=[PropSpec(**{**vars(p)}) for p in _PERSON_PROPS],
        filter='(Record[1] == "Mahinda" || Record[1] == "Michael") && Record[3] == "male"',
        mode="INSERT",
    )


_KNOWS_PROP = PropSpec(
    "creationDate", "DATETIME", 2,
    nullable=True, null_value="_NULL_", default_value="0000-00-00T00:00:00",
)


def knows_spec() -> EdgeSpec:
    """Edge KNOWS, string VIDs (basic.string.insert.v3.yaml:107-121)."""
    return EdgeSpec(
        name="KNOWS",
        src=NodeIDSpec(type="STRING", index=0),
        dst=NodeIDSpec(type="STRING", index=1),
        props=[PropSpec(**vars(_KNOWS_PROP))],
    )


def knows_rank_spec() -> EdgeSpec:
    """Edge KNOWS with concat VIDs + rank + filter (yaml:122-150)."""
    return EdgeSpec(
        name="KNOWS",
        src=NodeIDSpec(type="STRING", concat_items=["person_", 0, "_id"]),
        dst=NodeIDSpec(type="STRING", concat_items=["person_", 1, "_id"]),
        rank=RankSpec(index=0),
        props=[PropSpec(**vars(_KNOWS_PROP))],
        filter='Record[0] != "0"',
        mode="INSERT",
    )
