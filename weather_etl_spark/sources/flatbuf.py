"""Minimal FlatBuffers wire codec + the reference's frame protocol.

The reference's transport returns a byte stream of length-prefixed
FlatBuffers messages and decodes it with a loop that reads a 4-byte
little-endian length, treats the magic length value ``0x78656E55``
(the bytes ``"Unex"`` — error bodies start with "Unexpected") as an
error sentinel, and otherwise resolves the root table at
``pos + 4`` (/root/reference/package/openmeteo_requests/Client.py:26-43).
Per-variable values are exposed as zero-copy float32 vectors
(/root/reference/package/openmeteo_sdk/VariableWithValues.py:58-62).

The container has no ``flatbuffers`` runtime package, so this module
implements the public FlatBuffers binary format directly (from the
published spec — https://flatbuffers.dev/internals/):

- buffer = root uoffset32 -> root table,
- table  = soffset32 to its vtable (vtable_pos = table_pos - soffset),
  then inline fields; vtable = [u16 vtable_size, u16 table_size,
  u16 field_offset per slot, 0 = field absent],
- vectors/strings = u32 length prefix + payload, referenced via
  uoffset32 from the field location,
- all scalars little-endian, aligned to their own size.

Both the builder and the reader are schema-generic; the concrete
message layout used by the engine's source (a time-series frame) is
defined at the bottom. Nothing here is Spark-specific — the fetch
layer feeds decoded columns to Arrow.
"""

from __future__ import annotations

import struct

import numpy as np

#: Little-endian u32 of b"Unex" — error frames start with "Unexpected".
ERROR_SENTINEL = 0x78656E55


class WireError(Exception):
    """Raised when a frame carries the reference's error sentinel."""


class Builder:
    """Write-once FlatBuffers builder (buffer grows back-to-front).

    Positions are tracked as *rev-offsets* (bytes from the buffer end):
    with the finished buffer padded so ``total %% minalign == 0``, a
    rev-offset aligned to ``a`` lands on an ``a``-aligned final address,
    and a uoffset stored at rev ``Rl`` pointing at rev ``Ro`` is simply
    ``Rl - Ro``.
    """

    def __init__(self) -> None:
        self._buf = bytearray()
        self._minalign = 4
        self._vtable: dict[int, int] | None = None
        self._table_start = 0

    # -- low-level ---------------------------------------------------
    def _prep(self, align: int, extra: int) -> None:
        """Pad so the next ``extra``-byte write ends on an ``align``
        boundary (rev-offset arithmetic)."""
        self._minalign = max(self._minalign, align)
        while (len(self._buf) + extra) % align != 0:
            self._buf[:0] = b"\x00"

    def _prepend(self, data: bytes) -> int:
        self._buf[:0] = data
        return len(self._buf)

    def _prepend_scalar(self, fmt: str, value, align: int) -> int:
        self._prep(align, struct.calcsize(fmt))
        return self._prepend(struct.pack(fmt, value))

    # -- leaf objects ------------------------------------------------
    def create_string(self, s: str) -> int:
        raw = s.encode("utf-8") + b"\x00"
        self._prep(4, 4 + len(raw))
        return self._prepend(struct.pack("<I", len(raw) - 1) + raw)

    def create_float32_vector(self, values: np.ndarray) -> int:
        v = np.ascontiguousarray(values, dtype="<f4")
        self._prep(4, 4 + 4 * len(v))
        return self._prepend(struct.pack("<I", len(v)) + v.tobytes())

    def create_offset_vector(self, revs: list[int]) -> int:
        """Vector of uoffsets (e.g. a vector of tables)."""
        self._prep(4, 4 + 4 * len(revs))
        chunk = bytearray(struct.pack("<I", len(revs)))
        base = len(self._buf) + 4 + 4 * len(revs)
        # element i sits at rev  base - 4*(i+1); uoffset = loc_rev - target
        for i, r in enumerate(revs):
            chunk += struct.pack("<I", (base - 4 * (i + 1)) - r)
        return self._prepend(bytes(chunk))

    # -- tables ------------------------------------------------------
    def start_table(self) -> None:
        self._vtable = {}
        self._table_start = len(self._buf)

    def add_int64(self, slot: int, value: int, default: int = 0) -> None:
        if value != default:
            assert self._vtable is not None
            self._vtable[slot] = self._prepend_scalar("<q", value, 8)

    def add_int32(self, slot: int, value: int, default: int = 0) -> None:
        if value != default:
            assert self._vtable is not None
            self._vtable[slot] = self._prepend_scalar("<i", value, 4)

    def add_offset(self, slot: int, target_rev: int) -> None:
        assert self._vtable is not None
        self._prep(4, 4)
        loc_rev = len(self._buf) + 4
        self._vtable[slot] = self._prepend(
            struct.pack("<I", loc_rev - target_rev)
        )

    def end_table(self) -> int:
        assert self._vtable is not None
        fields, self._vtable = self._vtable, None
        # reserve the table's soffset slot, then lay the vtable below it
        self._prep(4, 4)
        table_rev = self._prepend(b"\x00\x00\x00\x00")
        table_size = table_rev - self._table_start
        n_slots = (max(fields) + 1) if fields else 0
        vt = struct.pack("<HH", 4 + 2 * n_slots, table_size)
        for slot in range(n_slots):
            off = fields.get(slot)
            vt += struct.pack("<H", (table_rev - off) if off else 0)
        self._prep(2, len(vt))
        vtable_rev = self._prepend(vt)
        # patch the soffset: vtable_pos = table_pos - soffset
        idx = len(self._buf) - table_rev
        self._buf[idx : idx + 4] = struct.pack("<i", vtable_rev - table_rev)
        return table_rev

    def finish(self, root_rev: int) -> bytes:
        self._prep(self._minalign, 4)
        root_loc = len(self._buf) + 4
        self._prepend(struct.pack("<I", root_loc - root_rev))
        while len(self._buf) % self._minalign != 0:
            self._buf[:0] = b"\x00"  # pragma: no cover - prep keeps aligned
        return bytes(self._buf)


class Table:
    """vtable-driven field access over a finished buffer."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self._buf = buf
        self._pos = pos

    @classmethod
    def root(cls, buf: bytes, offset: int = 0) -> "Table":
        (rel,) = struct.unpack_from("<I", buf, offset)
        return cls(buf, offset + rel)

    def _field_pos(self, slot: int) -> int | None:
        (soff,) = struct.unpack_from("<i", self._buf, self._pos)
        vt = self._pos - soff
        (vt_size,) = struct.unpack_from("<H", self._buf, vt)
        entry = 4 + 2 * slot
        if entry >= vt_size:
            return None
        (off,) = struct.unpack_from("<H", self._buf, vt + entry)
        return self._pos + off if off else None

    def int64(self, slot: int, default: int = 0) -> int:
        p = self._field_pos(slot)
        return default if p is None else struct.unpack_from("<q", self._buf, p)[0]

    def int32(self, slot: int, default: int = 0) -> int:
        p = self._field_pos(slot)
        return default if p is None else struct.unpack_from("<i", self._buf, p)[0]

    def string(self, slot: int) -> str | None:
        p = self._field_pos(slot)
        if p is None:
            return None
        (rel,) = struct.unpack_from("<I", self._buf, p)
        start = p + rel
        (n,) = struct.unpack_from("<I", self._buf, start)
        return self._buf[start + 4 : start + 4 + n].decode("utf-8")

    def _vector(self, slot: int) -> tuple[int, int] | None:
        p = self._field_pos(slot)
        if p is None:
            return None
        (rel,) = struct.unpack_from("<I", self._buf, p)
        start = p + rel
        (n,) = struct.unpack_from("<I", self._buf, start)
        return start + 4, n

    def float32_vector(self, slot: int) -> np.ndarray:
        """Zero-copy float32 view (VariableWithValues.py:58-62 analogue)."""
        v = self._vector(slot)
        if v is None:
            return np.empty(0, dtype="<f4")
        start, n = v
        return np.frombuffer(self._buf, dtype="<f4", count=n, offset=start)

    def table_vector(self, slot: int) -> list["Table"]:
        v = self._vector(slot)
        if v is None:
            return []
        start, n = v
        out = []
        for i in range(n):
            p = start + 4 * i
            (rel,) = struct.unpack_from("<I", self._buf, p)
            out.append(Table(self._buf, p + rel))
        return out


# ---------------------------------------------------------------------
# Frame protocol (Client.py:26-43 semantics)
# ---------------------------------------------------------------------


def frame_messages(messages: list[bytes]) -> bytes:
    """Length-prefix and concatenate finished FlatBuffers messages."""
    return b"".join(
        struct.pack("<I", len(m)) + m for m in messages
    )


def error_frame(text: str) -> bytes:
    """An in-stream error body; MUST start with 'Unexpected' so its
    first 4 bytes read back as the sentinel length."""
    if not text.startswith("Unexpected"):
        text = "Unexpected error: " + text
    return text.encode("utf-8")


def split_frames(data: bytes) -> list[bytes]:
    """The reference's decode loop: 4-byte LE length prefix per message,
    sentinel length 0x78656E55 -> the remainder is an error body."""
    messages = []
    total, pos, step = len(data), 0, 4
    while pos < total:
        (length,) = struct.unpack_from("<I", data, pos)
        if length == ERROR_SENTINEL:
            raise WireError(data[pos:total].decode("utf-8"))
        messages.append(data[pos + step : pos + step + length])
        pos += length + step
    return messages


# ---------------------------------------------------------------------
# Concrete message schema: TimeSeriesFrame
#
# Mirrors the reference's VariablesWithTime (start/end/interval time
# box) + VariableWithValues (name + float32 values) nesting:
#
#   table VariableColumn  { name: string;        // slot 0
#                           values: [float32]; } // slot 1
#   table TimeSeriesFrame { start_s: int64;      // slot 0
#                           end_s: int64;        // slot 1
#                           interval_s: int32;   // slot 2
#                           variables: [VariableColumn]; } // slot 3
# ---------------------------------------------------------------------


def encode_timeseries(
    start_s: int,
    end_s: int,
    interval_s: int,
    variables: dict[str, np.ndarray],
) -> bytes:
    """Build one finished TimeSeriesFrame message (no length prefix)."""
    b = Builder()
    var_revs = []
    for name, values in variables.items():
        name_rev = b.create_string(name)
        vals_rev = b.create_float32_vector(values)
        b.start_table()
        b.add_offset(0, name_rev)
        b.add_offset(1, vals_rev)
        var_revs.append(b.end_table())
    vec_rev = b.create_offset_vector(var_revs)
    b.start_table()
    b.add_int64(0, start_s)
    b.add_int64(1, end_s)
    b.add_int32(2, interval_s)
    b.add_offset(3, vec_rev)
    return b.finish(b.end_table())


def decode_timeseries(message: bytes) -> dict:
    """Decode one TimeSeriesFrame -> {"start_s", "end_s", "interval_s",
    "variables": {name: float32 ndarray (zero-copy view)}}."""
    root = Table.root(message)
    variables = {}
    for var in root.table_vector(3):
        variables[var.string(0)] = var.float32_vector(1)
    return {
        "start_s": root.int64(0),
        "end_s": root.int64(1),
        "interval_s": root.int32(2),
        "variables": variables,
    }
