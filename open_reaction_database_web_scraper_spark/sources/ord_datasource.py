"""The ORD document store as a first-class Spark 4 Python Data
Source (``spark.read.format("ord")``).

This is the reference's crawl/ingest loop re-expressed as a custom
connector: one input partition PER CAPTURE FILE — the same unit the
reference parallelizes over with its 3 browser workers
(web_scrpaer_2.py:308-327) — so a 1000-file corpus fans out across
1000 tasks with no driver-side parsing. Each task streams one file's
reaction records as flat arity rows (the bronze view
``ord_scan_documents`` computes relationally); a malformed file
yields zero rows, the PERMISSIVE posture of the reference's
try/except guard (web_scrpaer_2.py:451-456).

The DataFrame path (``sources/ord.py``) stays the production
ingestion — JVM JSON parsing, full nested schema. This connector is
the API-surface counterpart: it shows how a source Spark has no
reader for (a live crawl queue, a proprietary archive) plugs into
the planner with partition-level parallelism, while returning rows
value-checked against the same DuckDB oracle as the relational scan.
"""

from __future__ import annotations

import glob
import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

ORD_FLAT_SCHEMA = ("dataset_id string, total_reactions_scraped bigint, "
                   "reaction_pos int, reaction_id string, success boolean, "
                   "n_input_tabs int, n_outcomes int")


class OrdFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


# columns the reader can filter natively (single-part attributes)
_PUSHABLE = {("dataset_id",), ("success",), ("reaction_id",)}


class OrdDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ord source requires a 'path' option (glob)")
        self.pushed: list[EqualTo] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Native filter pushdown (Spark 4.1 connector API): EqualTo
        on the pushable columns is evaluated inside :meth:`read`
        while streaming each file — rows that fail never cross the
        Python→JVM Arrow boundary, the connector analog of parquet
        row-group pruning. Everything else is yielded back for Spark
        to evaluate post-scan (the contract: returned filters must
        be the input objects by reference)."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute in _PUSHABLE:
                self.pushed.append(f)
            else:
                yield f

    def _row_passes(self, row: tuple) -> bool:
        cols = {("dataset_id",): 0, ("reaction_id",): 3, ("success",): 4}
        return all(row[cols[f.attribute]] == f.value for f in self.pushed)

    def partitions(self) -> Sequence[OrdFilePartition]:
        # One partition per capture file — the reference's
        # per-dataset-worker parallel unit. The glob expands on the
        # driver (metadata only); file CONTENT is read in executors.
        files = sorted(glob.glob(self.path))
        if not files:
            raise ValueError(f"ord source matched no files: {self.path}")
        return [OrdFilePartition(p) for p in files]

    def read(self, partition: OrdFilePartition) -> Iterator[tuple]:
        try:
            with open(partition.path, encoding="utf-8") as f:
                doc = json.load(f)
        except (OSError, json.JSONDecodeError):
            return  # PERMISSIVE: malformed file -> zero rows
        if not isinstance(doc, dict):
            return
        for ds in doc.values():
            if not isinstance(ds, dict):
                continue
            dataset_id = ds.get("dataset_id")
            total = ds.get("total_reactions_scraped")
            reactions = ds.get("reactions") or []
            if not reactions:
                # posexplode_outer parity: empty dataset keeps one
                # all-NULL placeholder row
                row = (dataset_id, total, None, None, None, None, 0)
                if self._row_passes(row):
                    yield row
                continue
            for pos, r in enumerate(reactions):
                r = r if isinstance(r, dict) else {}
                tabs = r.get("inputsMap")
                row = (dataset_id, total, pos, r.get("reaction_id"),
                       r.get("success"),
                       len(tabs) if tabs is not None else None,
                       len(r.get("outcomes") or []))
                if self._row_passes(row):
                    yield row


class OrdDataSource(DataSource):
    """``spark.read.format("ord").option("path", glob)``."""

    @classmethod
    def name(cls) -> str:
        return "ord"

    def schema(self) -> str:
        return ORD_FLAT_SCHEMA

    def reader(self, schema) -> OrdDataSourceReader:
        return OrdDataSourceReader(self.options)


# ---------------------------------------------------------------------------
# Streaming flavor: the capture files as a micro-batch source


class OrdStreamReader(SimpleDataSourceStreamReader):
    """Streaming ORD source: offsets index into the sorted capture-
    file list — each file is an atomic arrival unit, the batch
    analog of the reference finishing one dataset crawl and flushing
    its JSON. ``read`` drains every not-yet-seen file and advances
    the offset; ``readBetweenOffsets`` deterministically REPLAYS an
    exact file range, which is what makes the source recoverable:
    after a crash, Spark re-asks for committed-but-unflushed ranges
    and must get byte-identical rows."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ord_stream source requires a 'path' option")
        self.files = sorted(glob.glob(self.path))

    def initialOffset(self) -> dict:
        return {"file_idx": 0}

    def _rows_for(self, lo: int, hi: int) -> Iterator[tuple]:
        reader = OrdDataSourceReader({"path": self.path})
        for path in self.files[lo:hi]:
            yield from reader.read(OrdFilePartition(path))

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["file_idx"]
        hi = len(self.files)
        # materialized list, not a generator: the simple-reader
        # framework CACHES and PICKLES the returned iterator for
        # replay (generators can't pickle). The simple API ships all
        # rows through the driver by design — right for control-rate
        # sources like this one; a high-volume source graduates to
        # the full DataSourceStreamReader with executor partitions.
        return list(self._rows_for(lo, hi)), {"file_idx": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return list(self._rows_for(start["file_idx"], end["file_idx"]))

    def commit(self, end: dict) -> None:
        pass  # files are immutable; nothing to clean up


class OrdStreamDataSource(DataSource):
    """``spark.readStream.format("ord_stream").option("path", glob)``."""

    @classmethod
    def name(cls) -> str:
        return "ord_stream"

    def schema(self) -> str:
        return ORD_FLAT_SCHEMA

    def simpleStreamReader(self, schema) -> OrdStreamReader:
        return OrdStreamReader(self.options)


# ---------------------------------------------------------------------------
# Sink flavor: transactional JSONL writer (write/commit/abort)


class OrdShardCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str | None, n_rows: int):
        self.tmp_path = tmp_path
        self.n_rows = n_rows


class OrdSinkWriter(DataSourceWriter):
    """Transactional JSONL sink: each task streams its partition to
    a TEMP shard and reports it in a commit message; only the driver
    ``commit`` renames shards to their final names and writes the
    ``_MANIFEST.json`` that makes them visible — readers who honor
    the manifest never observe a partially-failed job (the same
    atomicity contract a FileOutputCommitter gives parquet, rebuilt
    at the connector level; ``abort`` deletes the temp shards).
    This is the reference's document-store flush
    (web_scrpaer_2.py:545-548) upgraded from write-in-place to
    all-or-nothing."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ord_sink requires a 'path' option")

    def write(self, iterator) -> OrdShardCommit:
        import os
        import uuid
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), sort_keys=True,
                                   default=str) + "\n")
                n += 1
        if n == 0:  # no empty shards: drop the file, commit nothing
            os.remove(tmp)
            return OrdShardCommit(None, 0)
        return OrdShardCommit(tmp, n)

    def commit(self, messages) -> None:
        import os
        shards, total = [], 0
        for i, m in enumerate(m for m in messages
                              if m is not None and m.tmp_path):
            final = os.path.join(self.path, f"part-{i:05d}.jsonl")
            os.replace(m.tmp_path, final)
            shards.append(os.path.basename(final))
            total += m.n_rows
        manifest = {"shards": shards, "total_rows": total}
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, sort_keys=True)

    def abort(self, messages) -> None:
        import os
        for m in messages:
            if m is not None and m.tmp_path and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class OrdSinkDataSource(DataSource):
    """``df.write.format("ord_sink").option("path", dir).save()``."""

    @classmethod
    def name(cls) -> str:
        return "ord_sink"

    def writer(self, schema, overwrite: bool) -> OrdSinkWriter:
        return OrdSinkWriter(self.options)
