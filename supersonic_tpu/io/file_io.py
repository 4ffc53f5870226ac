"""Binary columnar file format (host-side).

Reference: cursor/infrastructure/file_io.cc — spill/interchange format:
data is written in chunks of at most 8192 rows (file_io.cc:33); each chunk
stores the row count, then per column the raw fixed-width value bytes, a
byte-per-row is_null vector for nullable columns (:56-75), and
variable-length payloads as lengths-then-concatenated-bytes (:77-101).

This engine keeps the same chunked layout (schema header added, since the
reference exchanges schemas out of band) so tables round-trip through
files; STRING columns are written decoded (lengths + utf-8 bytes) and
re-dictionary-encoded on read.  Disk spill is not used for execution
(HBM is the memory budget; SURVEY.md §7.1) — this is the interchange and
test-golden format.
"""
from __future__ import annotations

import io
import struct
from typing import BinaryIO, Iterable

import numpy as np

from ..batch import Table
from ..schema import Attribute, TupleSchema
from ..types import DataType, physical_dtype

MAX_CHUNK_ROWS = 8192  # reference: file_io.cc:33
MAGIC = b"SSTP1\n"


def _write_schema(f: BinaryIO, schema: TupleSchema) -> None:
    f.write(struct.pack("<I", len(schema)))
    for a in schema:
        name = a.name.encode()
        f.write(struct.pack("<I", len(name)))
        f.write(name)
        t = a.type.value.encode()
        f.write(struct.pack("<I", len(t)))
        f.write(t)
        f.write(struct.pack("<B", 1 if a.nullable else 0))


def _read_schema(f: BinaryIO) -> TupleSchema:
    (n,) = struct.unpack("<I", f.read(4))
    attrs = []
    for _ in range(n):
        (ln,) = struct.unpack("<I", f.read(4))
        name = f.read(ln).decode()
        (lt,) = struct.unpack("<I", f.read(4))
        t = DataType(f.read(lt).decode())
        (nullable,) = struct.unpack("<B", f.read(1))
        attrs.append(Attribute(name, t, bool(nullable)))
    return TupleSchema(attrs)


def write_table(f: BinaryIO, table: Table) -> None:
    """Write a Table (host-materialized) in the chunked columnar format."""
    f.write(MAGIC)
    _write_schema(f, table.schema)
    cols = table.to_numpy()
    n = int(table.num_rows)
    for start in range(0, max(n, 1), MAX_CHUNK_ROWS):
        count = min(MAX_CHUNK_ROWS, n - start)
        if count <= 0:
            break
        f.write(struct.pack("<I", count))
        for a in table.schema:
            data = cols[a.name][start:start + count]
            if a.type in (DataType.STRING, DataType.BINARY):
                is_null = np.array([v is None for v in data], dtype=np.uint8)
                if a.nullable:
                    f.write(is_null.tobytes())
                payloads = [
                    (v.encode() if isinstance(v, str) else (v or b""))
                    if v is not None else b"" for v in data]
                lengths = np.array([len(p) for p in payloads],
                                   dtype=np.uint32)
                f.write(lengths.tobytes())
                f.write(b"".join(payloads))
            else:
                dtype = physical_dtype(a.type)
                if a.nullable:
                    is_null = np.array([v is None for v in data],
                                       dtype=np.uint8)
                    f.write(is_null.tobytes())
                    vals = np.array([v if v is not None else 0 for v in data],
                                    dtype=dtype)
                else:
                    vals = np.asarray(data, dtype=dtype)
                f.write(vals.tobytes())
    f.write(struct.pack("<I", 0xFFFFFFFF))  # end marker


def read_table(f: BinaryIO, capacity: int | None = None) -> Table:
    magic = f.read(len(MAGIC))
    if magic != MAGIC:
        raise IOError("bad file magic")
    schema = _read_schema(f)
    chunks: dict[str, list] = {a.name: [] for a in schema}
    while True:
        raw = f.read(4)
        if len(raw) < 4:
            break
        (count,) = struct.unpack("<I", raw)
        if count == 0xFFFFFFFF:
            break
        for a in schema:
            if a.type in (DataType.STRING, DataType.BINARY):
                is_null = (np.frombuffer(f.read(count), dtype=np.uint8)
                           if a.nullable else np.zeros(count, np.uint8))
                lengths = np.frombuffer(f.read(4 * count), dtype=np.uint32)
                blob = f.read(int(lengths.sum()))
                vals, off = [], 0
                for i in range(count):
                    ln = int(lengths[i])
                    if is_null[i]:
                        vals.append(None)
                    else:
                        b = blob[off:off + ln]
                        vals.append(b.decode() if a.type == DataType.STRING
                                    else b)
                    off += ln
                chunks[a.name].extend(vals)
            else:
                dtype = physical_dtype(a.type)
                is_null = (np.frombuffer(f.read(count), dtype=np.uint8)
                           if a.nullable else np.zeros(count, np.uint8))
                vals = np.frombuffer(f.read(dtype.itemsize * count),
                                     dtype=dtype)
                if a.nullable:
                    chunks[a.name].extend(
                        None if is_null[i] else vals[i].item()
                        for i in range(count))
                else:
                    chunks[a.name].extend(vals.tolist())
    return Table.from_data(schema, chunks, capacity=capacity)


def save(path: str, table: Table) -> None:
    with open(path, "wb") as f:
        write_table(f, table)


def load(path: str, capacity: int | None = None) -> Table:
    with open(path, "rb") as f:
        return read_table(f, capacity)
