"""PySpark-native analytics engine with the query/data-processing
capabilities of the Open-Reaction-Database-Web-Scraper reference
(semi-structured nested-JSON ingestion, normalize/decode, dedup,
group-rollup, re-nest, sinks) plus the relational / streaming /
LLM-data-pipeline operator surface from SURVEY.md §2.

Architecture: thin, idiomatic DataFrame/SQL library — Catalyst does
the planning; no custom execution machinery. Every public query is
registered in :mod:`.registry` and exposed through
``__spark_entry__.py`` for the driver's differential-oracle gate.
"""

from .registry import REGISTRY, register  # noqa: F401

__version__ = "0.1.0"
