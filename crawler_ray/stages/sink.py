"""SQL sink: dynamic DDL + batch-buffered inserts (W1-W3 parity).

The reference's storage stack (``collector/sqlstorage/sqlstorage.go``,
``sqldb/sql_db.go``) creates a MySQL table per task from the rule's declared
``ItemFields`` (+ Url, Time; everything MEDIUMTEXT except Url/Time —
``sqlstorage.go:68-88``), buffers DataCells and flushes multi-row INSERTs at
``BatchCount`` (``sqlstorage.go:42-66,90-143``), JSON-marshalling non-string
values (``:114-121``) and filling missing fields with "".

Re-expressed for this engine: the *primary* sink is partitioned Parquet
(items_to_columns → write_parquet), but the SQL surface is kept byte-level
compatible on SQLite (stdlib — no MySQL in this container): same dynamic
DDL shape, same batch-buffered multi-row INSERT, same JSON/"" value
semantics. Used via ``Dataset.iter_batches`` on the driver or inside a
``map_batches`` consumer per block.
"""

from __future__ import annotations

import json
import sqlite3
from collections.abc import Iterable


class SqlItemSink:
    """Dynamic-DDL, batch-buffered SQL writer for one task/rule."""

    def __init__(
        self,
        db_path: str,
        table: str,
        item_fields: Iterable[str],
        batch_count: int = 100,
    ):
        self.conn = sqlite3.connect(db_path)
        self.table = table
        self.columns = [*item_fields, "Url", "Time"]
        self.batch_count = batch_count
        self.buffer: list[tuple] = []
        # dynamic DDL from declared fields (sqlstorage.go:68-88 / sql_db.go:68-84);
        # MEDIUMTEXT→TEXT, Url VARCHAR(250)→TEXT: sqlite is typeless anyway
        cols = ", ".join(f'"{c}" TEXT' for c in self.columns)
        self.conn.execute(f'CREATE TABLE IF NOT EXISTS "{table}" ({cols})')
        self.conn.commit()

    @staticmethod
    def _encode(value) -> str:
        """Sink value semantics (sqlstorage.go:108-126): missing → "",
        strings pass through, everything else JSON-marshalled."""
        if value is None:
            return ""
        if isinstance(value, str):
            return value
        return json.dumps(value, ensure_ascii=False)

    def save(self, item: dict) -> None:
        row = tuple(self._encode(item.get(c)) for c in self.columns)
        self.buffer.append(row)
        if len(self.buffer) >= self.batch_count:
            self.flush()

    def save_batch(self, items: Iterable[dict]) -> None:
        for item in items:
            self.save(item)

    def flush(self) -> None:
        """Multi-row INSERT of the buffered cells (sql_db.go:86-101)."""
        if not self.buffer:
            return
        placeholders = ", ".join(["(" + ", ".join("?" * len(self.columns)) + ")"] * len(self.buffer))
        cols = ", ".join(f'"{c}"' for c in self.columns)
        flat = [v for row in self.buffer for v in row]
        self.conn.execute(f'INSERT INTO "{self.table}" ({cols}) VALUES {placeholders}', flat)
        self.conn.commit()
        self.buffer.clear()

    def close(self) -> None:
        self.flush()
        self.conn.close()


def write_items_sql(ds, db_path: str, table: str, item_fields: list[str],
                    batch_count: int = 500) -> int:
    """Drain a Dataset of typed item rows into the SQL sink; returns rows
    written. Streaming consumption (iter_batches) — no driver materialize."""
    sink = SqlItemSink(db_path, table, item_fields, batch_count)
    n = 0
    for batch in ds.iter_batches(batch_size=batch_count, batch_format="pyarrow"):
        rows = batch.to_pylist()
        for r in rows:
            item = {f: r.get(f) for f in item_fields}
            item["Url"] = r.get("url", "")
            ts = r.get("ts")
            # reference formats wall clock as "2006-01-02 15:04:05"
            # (collect/rule.go:50); we format the deterministic warc_ts
            item["Time"] = ts.strftime("%Y-%m-%d %H:%M:%S") if ts is not None else ""
            sink.save(item)
            n += 1
    sink.close()
    return n
