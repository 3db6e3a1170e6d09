"""Minimal stdlib HDF5 codec — un-gates the S1-S3 science-file scans
(reference point_data.py:87-133, ATL06_data.py:82-206,
qfit_data.py:60-97) in a container that ships neither h5py nor libhdf5.

Implements the subset of the public HDF5 File Format Specification
(v3.0, support.hdfgroup.org) that HDF5 1.8/1.10-era writers — the ones
producing official ICESat-2 / ATM granules — use by default:

reader
  - superblock version 0/1 AND 2/3 ("latest format", HDF5 1.10+),
    little-endian, 8-byte offsets/lengths
  - "old-style" groups: symbol-table message → v1 B-tree → SNOD
    symbol nodes → local heap names (any nesting depth)
  - "new-style" groups: compact link messages in the header, or
    dense storage via fractal heap (any doubling-table depth —
    nested indirect blocks recurse) + v2 B-tree (name index, depth
    ≤ 1) — the layout HDF5 1.10+ writers emit with libver="latest"
  - v1 object headers incl. continuation blocks, and v2 "OHDR"
    headers incl. "OCHK" continuations, optional times /
    creation-order fields
  - dataspace v1/v2, datatype classes fixed-point/float/string,
    data layout v3 contiguous and chunked (v1 B-tree chunk index,
    any tree depth), data layout v4 chunked with single-chunk,
    implicit, and fixed-array (incl. paged) chunk indexes; filter
    pipeline v1/v2 with deflate (id 1) and shuffle (id 2) — both
    pure zlib/NumPy — honoring per-chunk filter masks
  - attribute messages v1/v2/v3 (fixed-size types) plus dense
    attribute storage (Attribute Info → fractal heap);
    unparseable attributes are skipped, never fatal
  - unknown header messages are skipped by size (the format is
    self-describing); unsupported *layouts* (extensible-array /
    v2-B-tree chunk indexes, depth-2 v2 B-trees, filtered or
    huge/tiny fractal-heap objects) raise NotImplementedError
    naming the gap

writer
  - default: superblock v0, old-style groups (B-tree + SNOD +
    local heap), v1 object headers
  - ``libver="latest"``: superblock v3, v2 "OHDR" headers, compact
    link messages (small groups) or dense fractal-heap + v2-B-tree
    links (large groups), layout v4 single-chunk / fixed-array
    chunk indexes, Jenkins lookup3 checksums — emits the same
    structures HDF5 1.10+ writes, so the reader's latest-format
    paths are round-trip pinned
  - n-dimensional datasets of little-endian fixed/float types,
    contiguous or chunked with optional gzip (+shuffle)
  - scalar string/int/float attributes

The writer emits what the reader parses (round-trip tested in
tests/test_hdf5.py) and follows the spec so libhdf5 tooling reads the
files; the reader tolerates the extra messages real files carry
(fill-value, modification-time, …) by skipping them.

Scale shape: the codec is pure `bytes`/NumPy — no JVM, no C
extension — so it ships inside Arrow-batched `mapInPandas` closures
and file conversion fans out across executors (see
``converters.distributed_point_scan``); one task per granule, the
same unit the reference parallelized with ``xargs -P 8``
(run_tile_updates:18).
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF
_SIG = b"\x89HDF\r\n\x1a\n"


# ===========================================================================
# low-level helpers
# ===========================================================================

def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _lookup3(data: bytes, init: int = 0) -> int:
    """Bob Jenkins lookup3 "hashlittle" — the checksum every v2/3
    metadata structure carries (spec appendix "Checksum Algorithm").
    The reader is tolerant (doesn't verify), but the writer emits
    real checksums so libhdf5 tooling accepts latest-format files."""
    M = 0xFFFFFFFF

    def rot(x: int, k: int) -> int:
        return ((x << k) | (x >> (32 - k))) & M

    a = b = c = (0xDEADBEEF + len(data) + init) & M
    i, n = 0, len(data)
    while n > 12:
        a = (a + int.from_bytes(data[i:i + 4], "little")) & M
        b = (b + int.from_bytes(data[i + 4:i + 8], "little")) & M
        c = (c + int.from_bytes(data[i + 8:i + 12], "little")) & M
        a = (a - c) & M; a ^= rot(c, 4); c = (c + b) & M
        b = (b - a) & M; b ^= rot(a, 6); a = (a + c) & M
        c = (c - b) & M; c ^= rot(b, 8); b = (b + a) & M
        a = (a - c) & M; a ^= rot(c, 16); c = (c + b) & M
        b = (b - a) & M; b ^= rot(a, 19); a = (a + c) & M
        c = (c - b) & M; c ^= rot(b, 4); b = (b + a) & M
        i += 12
        n -= 12
    tail = data[i:]
    if not tail:
        return c
    a = (a + int.from_bytes(tail[0:4].ljust(4, b"\x00"), "little")) & M
    b = (b + int.from_bytes(tail[4:8].ljust(4, b"\x00"), "little")) & M
    c = (c + int.from_bytes(tail[8:12].ljust(4, b"\x00"), "little")) & M
    c ^= b; c = (c - rot(b, 14)) & M
    a ^= c; a = (a - rot(c, 11)) & M
    b ^= a; b = (b - rot(a, 25)) & M
    c ^= b; c = (c - rot(b, 16)) & M
    a ^= c; a = (a - rot(c, 4)) & M
    b ^= a; b = (b - rot(a, 14)) & M
    c ^= b; c = (c - rot(b, 24)) & M
    return c


def _cksum(blob: bytes) -> bytes:
    return struct.pack("<I", _lookup3(blob))


def _dtype_message(dt: np.dtype) -> bytes:
    """Datatype message body for a little-endian fixed/float dtype."""
    dt = np.dtype(dt)
    if dt.kind == "f" and dt.itemsize == 8:
        head = struct.pack("<B3BI", 0x11, 0x20, 63, 0, 8)
        return head + struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
    if dt.kind == "f" and dt.itemsize == 4:
        head = struct.pack("<B3BI", 0x11, 0x20, 31, 0, 4)
        return head + struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
    if dt.kind in "iu" and dt.itemsize in (1, 2, 4, 8):
        bits0 = 0x08 if dt.kind == "i" else 0x00
        head = struct.pack("<B3BI", 0x10, bits0, 0, 0, dt.itemsize)
        return head + struct.pack("<HH", 0, dt.itemsize * 8)
    if dt.kind == "S":
        # fixed ASCII, null-padded (padding type 1)
        return struct.pack("<B3BI", 0x13, 0x01, 0, 0, dt.itemsize)
    raise NotImplementedError(f"unsupported dtype for HDF5 write: {dt}")


def _parse_dtype(body: bytes) -> np.dtype:
    cls_ver, b0, b1, b2, size = struct.unpack_from("<B3BI", body, 0)
    cls = cls_ver & 0x0F
    order = ">" if (b0 & 1) else "<"
    if cls == 0:  # fixed-point
        kind = "i" if (b0 & 0x08) else "u"
        return np.dtype(f"{order}{kind}{size}")
    if cls == 1:  # float
        return np.dtype(f"{order}f{size}")
    if cls == 3:  # string
        return np.dtype(f"S{size}")
    raise NotImplementedError(f"unsupported HDF5 datatype class {cls}")


def _dataspace_message(shape: tuple[int, ...]) -> bytes:
    body = struct.pack("<BBBB4x", 1, len(shape), 0, 0)
    for d in shape:
        body += struct.pack("<Q", d)
    return body


def _parse_dataspace(body: bytes) -> tuple[int, ...]:
    version = body[0]
    if version == 1:
        rank, flags = body[1], body[2]
        off = 8
    elif version == 2:
        rank, flags = body[1], body[2]
        off = 4
    else:
        raise NotImplementedError(f"dataspace version {version}")
    return tuple(struct.unpack_from("<Q", body, off + 8 * i)[0]
                 for i in range(rank))


# ===========================================================================
# writer
# ===========================================================================

@dataclass
class _Out:
    blocks: list[tuple[int, bytes]] = field(default_factory=list)
    eof: int = 96  # superblock v0 with 8/8 offsets occupies [0, 96)

    def alloc(self, b: bytes) -> int:
        addr = self.eof
        self.blocks.append((addr, b))
        self.eof += len(b)
        return addr


def _message(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _object_header(out: _Out, messages: list[bytes]) -> int:
    blob = b"".join(messages)
    head = struct.pack("<BxHII4x", 1, len(messages), 1, len(blob))
    return out.alloc(head + blob)


def _encode_attr_value(value) -> tuple[np.dtype, tuple[int, ...], bytes]:
    """(dtype, shape, raw bytes) for a scalar or array attribute value
    (fixed-size types; string arrays are fixed-width null-padded —
    what libhdf5 calls H5T_STR_NULLPAD)."""
    shape: tuple[int, ...] = ()
    if isinstance(value, str):
        raw = value.encode() + b"\x00"
        return np.dtype(f"S{len(raw)}"), shape, raw
    arr = np.asarray(value)
    shape = arr.shape
    if arr.dtype.kind in ("U", "S") or (
            arr.dtype == object and arr.size
            and isinstance(arr.flat[0], str)):
        enc = [str(v).encode() for v in arr.ravel()]
        width = max(len(e) for e in enc) + 1
        dt = np.dtype(f"S{width}")
        return dt, shape, b"".join(e.ljust(width, b"\x00") for e in enc)
    dt = np.dtype("<i8") if arr.dtype.kind in "iu" else np.dtype("<f8")
    return dt, shape, arr.astype(dt).tobytes()


def _attr_message(name: str, value) -> bytes:
    """Version-1 attribute message (8-byte-padded name/type/space)."""
    dt, shape, data = _encode_attr_value(value)
    nameb = name.encode() + b"\x00"
    dtm = _pad8(_dtype_message(dt))
    dsm = _pad8(_dataspace_message(shape))
    body = struct.pack("<BxHHH", 1, len(nameb), len(dtm), len(dsm))
    return body + _pad8(nameb) + dtm + dsm + data


def _fill_value_message() -> bytes:
    # v2, alloc time late, write time if-set, undefined fill
    return struct.pack("<BBBB", 2, 2, 0, 0)


def _chunk_blocks(arr: np.ndarray, chunks: tuple[int, ...],
                  compress: int | None, shuffle: bool
                  ) -> list[tuple[tuple[int, ...], bytes]]:
    """(origin, filtered-bytes) for every chunk of `arr`, row-major
    over the chunk grid (the order every HDF5 linear chunk index
    uses). Edge chunks are zero-padded to full chunk shape."""
    dt = arr.dtype
    entries: list[tuple[tuple[int, ...], bytes]] = []
    for origin in _grid_origins(arr.shape, chunks):
        sel = tuple(slice(o, min(o + c, s))
                    for o, c, s in zip(origin, chunks, arr.shape))
        block = np.zeros(chunks, dtype=dt)  # edge chunks zero-padded
        block[tuple(slice(0, s.stop - s.start) for s in sel)] = arr[sel]
        raw = block.tobytes()
        if shuffle:
            raw = (np.frombuffer(raw, np.uint8)
                   .reshape(-1, dt.itemsize).T.tobytes())
        if compress is not None:
            raw = zlib.compress(raw, compress)
        entries.append((origin, raw))
    return entries


def _filter_pipeline_message(dt: np.dtype, compress: int | None,
                             shuffle: bool) -> bytes:
    filters = []
    if shuffle:
        filters.append(struct.pack("<HHHHI", 2, 0, 0, 1, dt.itemsize)
                       + b"\x00" * 4)
    if compress is not None:
        filters.append(struct.pack("<HHHHI", 1, 0, 0, 1, compress)
                       + b"\x00" * 4)
    return struct.pack("<BB2x4x", 1, len(filters)) + b"".join(filters)


def _write_dataset(out: _Out, arr: np.ndarray, compress: int | None,
                   shuffle: bool, chunks: tuple[int, ...] | None,
                   attrs: dict) -> int:
    arr = np.ascontiguousarray(arr)
    dt = arr.dtype.newbyteorder("<")
    arr = arr.astype(dt, copy=False)
    msgs = [_message(0x0001, _dataspace_message(arr.shape)),
            _message(0x0003, _dtype_message(dt)),
            _message(0x0005, _fill_value_message())]
    if compress is None and chunks is None:
        addr = out.alloc(arr.tobytes())
        layout = struct.pack("<BBQQ", 3, 1, addr, arr.nbytes)
        msgs.append(_message(0x0008, layout))
    else:
        chunks = tuple(chunks or arr.shape)
        if len(chunks) != arr.ndim:
            raise ValueError("chunks rank mismatch")
        rank = arr.ndim
        entries = _chunk_blocks(arr, chunks, compress, shuffle)
        if entries:
            children = [out.alloc(b) for _, b in entries]
            key_fmt = "<II" + "Q" * (rank + 1)
            node = [b"TREE", struct.pack("<BBH", 1, 0, len(entries)),
                    struct.pack("<QQ", UNDEF, UNDEF)]
            for (origin, raw), child in zip(entries, children):
                node.append(struct.pack(key_fmt, len(raw), 0, *origin, 0))
                node.append(struct.pack("<Q", child))
            # final key: one past the last chunk in every dimension
            node.append(struct.pack(key_fmt, 0, 0,
                                    *[s + c for s, c in
                                      zip(entries[-1][0], chunks)], 0))
            btree = out.alloc(b"".join(node))
        else:
            # zero-size dataset: no chunks exist. An undefined B-tree
            # address is the HDF5 convention for never-allocated chunked
            # storage; the reader returns fill for it.
            btree = UNDEF
        layout = struct.pack("<BBB", 3, 2, rank + 1) + struct.pack("<Q", btree)
        for c in chunks:
            layout += struct.pack("<I", c)
        layout += struct.pack("<I", dt.itemsize)
        msgs.append(_message(0x0008, layout))
        msgs.append(_message(
            0x000B, _filter_pipeline_message(dt, compress, shuffle)))
    for k, v in attrs.items():
        msgs.append(_message(0x000C, _attr_message(k, v)))
    return _object_header(out, msgs)


def _write_group(out: _Out, tree: dict, attrs: dict) -> int:
    """Post-order group write: children, local heap, SNOD, B-tree,
    then the group's object header. Returns the header address."""
    names = sorted(tree)
    child_addr: dict[str, int] = {}
    for name in names:
        val = tree[name]
        if isinstance(val, dict):
            child_addr[name] = _write_group(
                out, {k: v for k, v in val.items() if k != "__attrs__"},
                val.get("__attrs__", {}))
        elif isinstance(val, _Dataset):
            child_addr[name] = _write_dataset(
                out, val.data, val.compress, val.shuffle, val.chunks,
                val.attrs)
        else:
            child_addr[name] = _write_dataset(
                out, np.asarray(val), None, False, None, {})
    # local heap: offset 0 holds the empty name (B-tree key 0)
    heap_data = bytearray(b"\x00" * 8)
    name_off = {}
    for name in names:
        name_off[name] = len(heap_data)
        heap_data += _pad8(name.encode() + b"\x00")
    heap_seg = out.alloc(bytes(heap_data))
    heap = out.alloc(b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_data),
                                           UNDEF, heap_seg))
    # one SNOD with all entries (K_leaf is writer-chosen; entries used
    # is authoritative for readers)
    ent = bytearray()
    for name in names:
        ent += struct.pack("<QQII16x", name_off[name], child_addr[name],
                           0, 0)
    snod = out.alloc(b"SNOD" + struct.pack("<BBH", 1, 0, len(names))
                     + bytes(ent))
    last_key = name_off[names[-1]] if names else 0
    btree = out.alloc(b"TREE" + struct.pack("<BBHQQ", 0, 0, 1, UNDEF, UNDEF)
                      + struct.pack("<QQQ", 0, snod, last_key))
    msgs = [_message(0x0011, struct.pack("<QQ", btree, heap))]
    for k, v in attrs.items():
        msgs.append(_message(0x000C, _attr_message(k, v)))
    return _object_header(out, msgs)


# ---------------------------------------------------------------------------
# "latest format" writer (superblock v3 / OHDR / layout v4) — emits the
# structures HDF5 1.10+ produces with libver="latest", so the reader's
# new-format paths are round-trip pinned without libhdf5 in the container.
# ---------------------------------------------------------------------------

_DENSE_LINK_THRESHOLD = 8  # libhdf5 default max_compact
_FA_PAGE_BITS = 10         # fixed-array elements per page = 2^10
_BT2_NODE_SIZE = 2048      # v2 B-tree node size for the link name index


def _message_v2(mtype: int, body: bytes) -> bytes:
    """v2 object-header message: 1-byte type, no 8-byte padding."""
    return struct.pack("<BHB", mtype, len(body), 0) + body


def _object_header_v2(out: _Out, messages: list[bytes]) -> int:
    blob = b"".join(messages)
    # flags 0x02: chunk-0 size in 4 bytes; no times / creation order
    head = b"OHDR" + bytes([2, 0x02]) + struct.pack("<I", len(blob)) + blob
    return out.alloc(head + _cksum(head))


def _dataspace_message_v2(shape: tuple[int, ...]) -> bytes:
    body = struct.pack("<BBBB", 2, len(shape), 0, 1 if shape else 0)
    for d in shape:
        body += struct.pack("<Q", d)
    return body


def _attr_message_v3(name: str, value) -> bytes:
    """Version-3 attribute message (unpadded, with charset byte)."""
    dt, shape, data = _encode_attr_value(value)
    nameb = name.encode() + b"\x00"
    dtm = _dtype_message(dt)
    dsm = _dataspace_message(shape)
    body = struct.pack("<BBHHHB", 3, 0, len(nameb), len(dtm), len(dsm), 0)
    return body + nameb + dtm + dsm + data


def _link_message(name: str, addr: int) -> bytes:
    """Version-1 hard-link message."""
    nameb = name.encode()
    lsz = 0 if len(nameb) < 256 else 1  # flags bits 0-1: name-length size
    body = bytes([1, lsz]) + len(nameb).to_bytes(1 << lsz, "little")
    return body + nameb + struct.pack("<Q", addr)


def _link_info_message(fheap: int, name_btree: int) -> bytes:
    return struct.pack("<BBQQ", 0, 0, fheap, name_btree)


def _write_multiblock_heap(out: _Out, bodies: list[bytes],
                           fheap_addr: int, width: int, start_size: int,
                           max_direct: int, id_len: int, offb: int,
                           lenb: int, dblk_hdr: int) -> list[bytes]:
    """Doubling-table fractal heap: direct blocks packed in heap-offset
    order under a root indirect block, with one level of nested
    indirect blocks once rows pass max_direct_rows (each nested block
    covers its row's block size via its own table — the libhdf5
    H5HFiblock layout the reader recurses through). Returns heap IDs
    in ``bodies`` order."""
    max_rows_direct = max_direct.bit_length() - start_size.bit_length() + 2
    sw_bits = (start_size * width).bit_length()

    def row_size(row: int) -> int:
        return start_size if row < 2 else start_size << (row - 1)

    def table_slots(base_off: int, nrows: int | None):
        """Direct-block (heap_off, size) slots in heap-offset order;
        nrows=None walks the root table unboundedly."""
        off, row = base_off, 0
        while nrows is None or row < nrows:
            size = row_size(row)
            for _ in range(width):
                if row < max_rows_direct:
                    yield off, size
                else:
                    sub = size.bit_length() - sw_bits + 1
                    if sub > max_rows_direct:
                        raise NotImplementedError(
                            "dense link heap deeper than one nested "
                            "indirect level — split the group")
                    yield from table_slots(off, sub)
                off += size
            row += 1

    # greedy packing: messages never span blocks; slot sizes are
    # non-decreasing so a message that fits max_direct never strands
    slots = table_slots(0, None)
    packed: dict[int, tuple[int, list[bytes]]] = {}
    heap_ids: list[bytes] = []
    cur_off, cur_size = next(slots)
    cur: list[bytes] = []
    pos = dblk_hdr
    for b in bodies:
        if dblk_hdr + len(b) > max_direct:
            raise ValueError("link message exceeds max direct block")
        if pos + len(b) > cur_size:
            packed[cur_off] = (cur_size, cur)
            cur_off, cur_size = next(slots)
            cur, pos = [], dblk_hdr
        heap_ids.append(bytes([0])
                        + (cur_off + pos).to_bytes(offb, "little")
                        + len(b).to_bytes(lenb, "little"))
        cur.append(b)
        pos += len(b)
    packed[cur_off] = (cur_size, cur)
    used_end = cur_off + cur_size

    root_rows, cover = 0, 0
    while cover < used_end:
        cover += width * row_size(root_rows)
        root_rows += 1

    # deterministic address layout: header, direct blocks in heap
    # order, nested indirect blocks, root indirect block
    next_addr = fheap_addr + 146
    dir_addr: dict[int, int] = {}
    for ho in sorted(packed):
        dir_addr[ho] = next_addr
        next_addr += packed[ho][0]

    def iblock_nbytes(nrows: int) -> int:
        return 4 + 1 + 8 + offb + 8 * width * nrows + 4

    children: list[tuple[int, int, int]] = []   # (base_off, nrows, addr)
    off = 0
    for row in range(root_rows):
        size = row_size(row)
        for _ in range(width):
            if row >= max_rows_direct and off < used_end:
                nr = size.bit_length() - sw_bits + 1
                children.append((off, nr, next_addr))
                next_addr += iblock_nbytes(nr)
            off += size
    root_addr = next_addr
    child_addr = {bo: ad for bo, _nr, ad in children}

    used_bytes = sum(dblk_hdr + sum(len(x) for x in bs)
                     for _, bs in packed.values())
    out.alloc(_fheap_hdr(id_len, width, start_size, max_direct,
                         root_addr, root_rows, cover - used_bytes,
                         cover, used_bytes, len(bodies)))
    for ho in sorted(packed):
        size, bs = packed[ho]
        blk = (b"FHDB" + bytes([0]) + struct.pack("<Q", fheap_addr)
               + ho.to_bytes(offb, "little") + b"".join(bs))
        addr = out.alloc(blk.ljust(size, b"\x00"))
        assert addr == dir_addr[ho]

    def iblock_bytes(base_off: int, nrows: int) -> bytes:
        body = (b"FHIB" + bytes([0]) + struct.pack("<Q", fheap_addr)
                + base_off.to_bytes(offb, "little"))
        o = base_off
        for row in range(nrows):
            size = row_size(row)
            for _ in range(width):
                a = (dir_addr.get(o, UNDEF) if row < max_rows_direct
                     else child_addr.get(o, UNDEF))
                body += struct.pack("<Q", a)
                o += size
        return body + _cksum(body)

    for bo, nr, ad in children:
        addr = out.alloc(iblock_bytes(bo, nr))
        assert addr == ad
    addr = out.alloc(iblock_bytes(0, root_rows))
    assert addr == root_addr
    return heap_ids


def _fheap_hdr(id_len: int, width: int, start: int, maxdir: int,
               root: int, cur_rows: int, free: int, man_space: int,
               iter_off: int, nobj: int) -> bytes:
    """146-byte FRHP header (8/8 offsets, no filters, 32-bit heap)."""
    hdr = b"FRHP" + bytes([0])
    hdr += struct.pack("<HHB", id_len, 0, 0)        # id len, filters, flags
    hdr += struct.pack("<I", 4096)                  # max managed obj size
    hdr += struct.pack("<QQ", 0, UNDEF)             # next huge id, huge bt
    hdr += struct.pack("<QQ", free, UNDEF)          # free space, fs mgr
    hdr += struct.pack("<QQQQ", man_space, man_space, iter_off, nobj)
    hdr += struct.pack("<QQQQ", 0, 0, 0, 0)         # huge/tiny sizes+counts
    hdr += struct.pack("<HQQ", width, start, maxdir)
    hdr += struct.pack("<HHQH", 32, 1, root, cur_rows)  # bits, srows, root
    assert len(hdr) + 4 == 146
    return hdr + _cksum(hdr)


def _write_dense_links(out: _Out, names: list[str], bodies: list[bytes],
                       width: int = 4, start_size: int = 512,
                       max_direct: int = 65536) -> tuple[int, int]:
    """Dense link storage: fractal heap holding the link messages plus
    a v2 B-tree (type 5, name index, depth 0 or 1) of (hash, heap-id)
    records. Small groups get a single root direct block; beyond one
    direct block the heap grows through the spec's doubling table —
    root indirect block over direct blocks, then one level of NESTED
    indirect blocks (rows past max_direct_rows), which is what pins
    the reader's recursive _map_indirect path. Returns (heap header
    addr, B-tree header addr)."""
    offb = 4                       # max_heap_size = 32 bits
    lenb = 2                       # lengths sized for 64 KiB max direct
    id_len = 1 + offb + lenb
    dblk_hdr = 4 + 1 + 8 + offb    # FHDB prefix (no block checksums)
    total = dblk_hdr + sum(len(b) for b in bodies)
    fheap_addr = out.eof           # header precedes the blocks
    single = 512
    while single < total:
        single *= 2
    if single <= min(65536, max_direct):
        # single root direct block (cur_rows = 0) — the common case,
        # byte-identical to the pre-indirect writer
        dblk_addr = fheap_addr + 146
        out.alloc(_fheap_hdr(id_len, 4, single, 65536, dblk_addr, 0,
                             single - total, single, total, len(bodies)))
        dblk = b"FHDB" + bytes([0]) + struct.pack("<Q", fheap_addr)
        dblk += (0).to_bytes(offb, "little")        # block offset 0
        heap_ids = []
        pos = dblk_hdr
        for b in bodies:
            heap_ids.append(bytes([0]) + pos.to_bytes(offb, "little")
                            + len(b).to_bytes(lenb, "little"))
            pos += len(b)
        dblk += b"".join(bodies)
        out.alloc(dblk.ljust(single, b"\x00"))
    else:
        heap_ids = _write_multiblock_heap(out, bodies, fheap_addr,
                                          width, start_size, max_direct,
                                          id_len, offb, lenb, dblk_hdr)
    # v2 B-tree name index: records sorted by NUMERIC lookup3(name) —
    # libhdf5 binary-searches on the hash value, and byte-lexicographic
    # order of the little-endian packing differs from numeric order.
    # Hash ties order by name bytes (the dense comparator's tie rule).
    rec_size = 4 + id_len
    recs = [struct.pack("<I", h) + hid for h, _n, hid in
            sorted((_lookup3(n.encode()), n.encode(), hid)
                   for n, hid in zip(names, heap_ids))]
    max_leaf = (_BT2_NODE_SIZE - 10) // rec_size
    if len(recs) <= max_leaf:
        leaf = b"BTLF" + bytes([0, 5]) + b"".join(recs)
        root_addr = out.alloc(leaf + _cksum(leaf))
        root_nrec, depth = len(recs), 0
    else:
        # depth 1: split into leaves, promote separators into the root
        k = -(-(len(recs) + 1) // (max_leaf + 1))   # number of leaves
        per = (len(recs) - (k - 1)) // k
        extra = (len(recs) - (k - 1)) % k
        children, seps, p = [], [], 0
        for i in range(k):
            n = per + (1 if i < extra else 0)
            leaf = b"BTLF" + bytes([0, 5]) + b"".join(recs[p:p + n])
            children.append((out.alloc(leaf + _cksum(leaf)), n))
            p += n
            if i < k - 1:
                seps.append(recs[p])
                p += 1
        nb = max(1, (max_leaf.bit_length() + 7) // 8)
        node = b"BTIN" + bytes([0, 5]) + b"".join(seps)
        for ca, cn in children:
            node += struct.pack("<Q", ca) + cn.to_bytes(nb, "little")
        root_addr = out.alloc(node + _cksum(node))
        root_nrec, depth = len(seps), 1
    bt = b"BTHD" + bytes([0, 5])
    bt += struct.pack("<IHHBB", _BT2_NODE_SIZE, rec_size, depth, 100, 40)
    bt += struct.pack("<QHQ", root_addr, root_nrec, len(recs))
    btree_addr = out.alloc(bt + _cksum(bt))
    return fheap_addr, btree_addr


def _write_dataset_v2(out: _Out, arr: np.ndarray, compress: int | None,
                      shuffle: bool, chunks: tuple[int, ...] | None,
                      attrs: dict) -> int:
    arr = np.ascontiguousarray(arr)
    dt = arr.dtype.newbyteorder("<")
    arr = arr.astype(dt, copy=False)
    msgs = [_message_v2(0x01, _dataspace_message_v2(arr.shape)),
            _message_v2(0x03, _dtype_message(dt)),
            _message_v2(0x05, _fill_value_message())]
    filtered = compress is not None or shuffle
    if not filtered and chunks is None:
        addr = out.alloc(arr.tobytes()) if arr.nbytes else UNDEF
        msgs.append(_message_v2(
            0x08, struct.pack("<BBQQ", 4, 1, addr, arr.nbytes)))
    else:
        chunks = tuple(chunks or arr.shape)
        if len(chunks) != arr.ndim:
            raise ValueError("chunks rank mismatch")
        entries = (_chunk_blocks(arr, chunks, compress, shuffle)
                   if arr.size else [])
        single = len(entries) <= 1
        head = struct.pack("<BBBBB", 4, 2,
                           2 if (filtered and single) else 0,
                           arr.ndim, 8)
        for c in chunks:
            head += struct.pack("<Q", c)
        if single:
            head += bytes([1])  # single-chunk index
            if entries:
                raw = entries[0][1]
                addr = out.alloc(raw)
                if filtered:
                    head += struct.pack("<QI", len(raw), 0)
                head += struct.pack("<Q", addr)
            else:
                if filtered:
                    head += struct.pack("<QI", 0, 0)
                head += struct.pack("<Q", UNDEF)
        else:
            addrs = [out.alloc(raw) for _, raw in entries]
            if filtered:
                entry_size = 20  # addr(8) + size(8) + filter mask(4)
                elem = b"".join(
                    struct.pack("<QQI", a, len(raw), 0)
                    for a, (_, raw) in zip(addrs, entries))
            else:
                entry_size = 8
                elem = b"".join(struct.pack("<Q", a) for a in addrs)
            n = len(entries)
            fahd_addr = out.eof
            fadb_addr = fahd_addr + 28  # FAHD is 28 bytes
            fahd = b"FAHD" + bytes([0, 1 if filtered else 0,
                                    entry_size, _FA_PAGE_BITS])
            fahd += struct.pack("<QQ", n, fadb_addr)
            out.alloc(fahd + _cksum(fahd))
            per = 1 << _FA_PAGE_BITS
            fadb = (b"FADB" + bytes([0, 1 if filtered else 0])
                    + struct.pack("<Q", fahd_addr))
            if n <= per:
                fadb += elem
                out.alloc(fadb + _cksum(fadb))
            else:
                npages = -(-n // per)
                bits = bytearray((npages + 7) // 8)
                for i in range(npages):
                    bits[i // 8] |= 1 << (i % 8)
                fadb += bytes(bits)
                fadb += _cksum(fadb)
                for i in range(npages):
                    pg = elem[i * per * entry_size:(i + 1) * per * entry_size]
                    fadb += pg + _cksum(pg)
                out.alloc(fadb)
            head += bytes([3, _FA_PAGE_BITS]) + struct.pack("<Q", fahd_addr)
        msgs.append(_message_v2(0x08, head))
        if filtered:
            msgs.append(_message_v2(
                0x0B, _filter_pipeline_message(dt, compress, shuffle)))
    for k, v in attrs.items():
        msgs.append(_message_v2(0x0C, _attr_message_v3(k, v)))
    return _object_header_v2(out, msgs)


def _write_group_v2(out: _Out, tree: dict, attrs: dict) -> int:
    names = sorted(tree)
    child_addr: dict[str, int] = {}
    for name in names:
        val = tree[name]
        if isinstance(val, dict):
            child_addr[name] = _write_group_v2(
                out, {k: v for k, v in val.items() if k != "__attrs__"},
                val.get("__attrs__", {}))
        elif isinstance(val, _Dataset):
            child_addr[name] = _write_dataset_v2(
                out, val.data, val.compress, val.shuffle, val.chunks,
                val.attrs)
        else:
            child_addr[name] = _write_dataset_v2(
                out, np.asarray(val), None, False, None, {})
    bodies = [_link_message(n, child_addr[n]) for n in names]
    msgs = []
    if len(bodies) <= _DENSE_LINK_THRESHOLD:
        msgs.append(_message_v2(0x02, _link_info_message(UNDEF, UNDEF)))
        msgs += [_message_v2(0x06, b) for b in bodies]
    else:
        fheap, btree = _write_dense_links(out, names, bodies)
        msgs.append(_message_v2(0x02, _link_info_message(fheap, btree)))
    msgs.append(_message_v2(0x0A, struct.pack("<BB", 0, 0)))  # group info
    for k, v in attrs.items():
        msgs.append(_message_v2(0x0C, _attr_message_v3(k, v)))
    return _object_header_v2(out, msgs)


@dataclass
class _Dataset:
    """Writer-side dataset spec: ``dataset(arr, compress=6, shuffle=True,
    chunks=(1000,))`` in a `write_h5` tree requests chunked storage."""
    data: np.ndarray
    compress: int | None = None
    shuffle: bool = False
    chunks: tuple[int, ...] | None = None
    attrs: dict = field(default_factory=dict)


def dataset(data, compress: int | None = None, shuffle: bool = False,
            chunks: tuple[int, ...] | None = None,
            attrs: dict | None = None) -> _Dataset:
    return _Dataset(np.asarray(data), compress, shuffle,
                    tuple(chunks) if chunks else None, attrs or {})


def write_h5(path: str, tree: dict, attrs: dict | None = None,
             libver: str | None = None) -> None:
    """Write a {name: array | dataset(...) | subdict} tree as an HDF5
    file. Default: superblock v0 + old-style groups (what HDF5 1.8
    writers emit). ``libver="latest"``: superblock v3 + OHDR headers +
    layout v4 (what HDF5 1.10+ emits with libver latest)."""
    if libver == "latest":
        out = _Out(eof=48)  # superblock v3 occupies [0, 48)
        root = _write_group_v2(out, tree, attrs or {})
        sb = _SIG + bytes([3, 8, 8, 0])
        sb += struct.pack("<QQQQ", 0, UNDEF, out.eof, root)
        sb += _cksum(sb)
        with open(path, "wb") as fh:
            fh.write(sb)
            for addr, block in out.blocks:
                fh.seek(addr)
                fh.write(block)
        return
    if libver not in (None, "earliest"):
        raise ValueError(f"libver {libver!r} (use None/'earliest'/'latest')")
    out = _Out()
    root = _write_group(out, tree, attrs or {})
    sb = _SIG + struct.pack("<BBBBBBBxHHI", 0, 0, 0, 0, 0, 8, 8, 4, 16, 0)
    sb += struct.pack("<QQQQ", 0, UNDEF, out.eof, UNDEF)
    sb += struct.pack("<QQII16x", 0, root, 0, 0)
    with open(path, "wb") as fh:
        fh.write(sb.ljust(96, b"\x00"))
        for addr, block in out.blocks:
            fh.seek(addr)
            fh.write(block)


# ===========================================================================
# reader
# ===========================================================================

class H5Dataset:
    def __init__(self, buf: bytes, shape, dtype, layout, attrs):
        self._buf = buf
        self.shape = shape
        self.dtype = dtype
        self._layout = layout
        self.attrs = attrs

    def __getitem__(self, key) -> np.ndarray:
        return self._read()[key]

    def _read(self) -> np.ndarray:
        kind = self._layout[0]
        if kind == "contiguous":
            _, addr, size = self._layout
            n = int(np.prod(self.shape)) if self.shape else 1
            if addr == UNDEF:  # never-allocated data → fill (zeros)
                return np.zeros(self.shape, self.dtype)
            a = np.frombuffer(self._buf, self.dtype, count=n, offset=addr)
            return a.reshape(self.shape)
        chunks, filters = self._layout[2], self._layout[-1]
        out = np.zeros(self.shape, self.dtype)
        for origin, size, raw_addr, mask in self._iter_chunks():
            if raw_addr == UNDEF:  # unallocated chunk → fill
                continue
            raw = self._buf[raw_addr:raw_addr + size]
            for idx in range(len(filters) - 1, -1, -1):
                fid, _cvals = filters[idx]
                if mask >> idx & 1:  # filter skipped for this chunk
                    continue
                if fid == 1:
                    raw = zlib.decompress(raw)
                elif fid == 2:
                    it = self.dtype.itemsize
                    raw = (np.frombuffer(raw, np.uint8)
                           .reshape(it, -1).T.tobytes())
                else:
                    raise NotImplementedError(f"HDF5 filter id {fid}")
            block = np.frombuffer(raw, self.dtype).reshape(chunks)
            sel = tuple(slice(o, min(o + c, s))
                        for o, c, s in zip(origin, chunks, self.shape))
            out[sel] = block[tuple(slice(0, s.stop - s.start)
                                   for s in sel)]
        return out

    def _iter_chunks(self):
        """(origin, stored size, file addr, filter mask) per chunk,
        across every supported chunk-index flavor."""
        kind, addr, chunks = self._layout[:3]
        rank = len(self.shape)
        nbytes = int(np.prod(chunks)) * self.dtype.itemsize
        if kind == "chunked":  # v1 B-tree index
            if addr != UNDEF:
                yield from _walk_chunk_btree(self._buf, addr, rank)
        elif kind == "chunked_single":
            _, addr, chunks, fsize, mask, _f = self._layout
            if addr != UNDEF:
                yield ((0,) * rank,
                       fsize if fsize is not None else nbytes, addr, mask)
        elif kind == "chunked_implicit":
            if addr != UNDEF:  # never-allocated → fill, like every index
                for i, origin in enumerate(
                        _grid_origins(self.shape, chunks)):
                    yield origin, nbytes, addr + i * nbytes, 0
        elif kind == "chunked_farr":
            if addr != UNDEF:
                yield from _fixed_array_chunks(
                    self._buf, addr, self.shape, chunks, nbytes)
        else:  # pragma: no cover
            raise NotImplementedError(f"chunk layout {kind}")


class H5Group:
    def __init__(self, entries: dict, attrs: dict):
        self._entries = entries
        self.attrs = attrs

    def keys(self):
        return self._entries.keys()

    def __contains__(self, name: str) -> bool:
        try:
            self[name]
            return True
        except KeyError:
            return False

    def __getitem__(self, name: str):
        node = self
        for part in name.strip("/").split("/"):
            if not isinstance(node, H5Group) or part not in node._entries:
                raise KeyError(name)
            node = node._entries[part]
        return node


def _grid_origins(shape, chunks):
    """Chunk origins in row-major order over the chunk grid — the
    order every linear HDF5 chunk index (implicit, fixed array) uses."""
    import itertools
    return itertools.product(*[range(0, s, c)
                               for s, c in zip(shape, chunks)])


def _walk_chunk_btree(buf: bytes, addr: int, rank: int):
    """Yield (origin, stored_size, data_addr, filter_mask) for every
    chunk under a v1 B-tree (type 1) of any depth."""
    if buf[addr:addr + 4] != b"TREE":
        raise ValueError("bad chunk B-tree node signature")
    level, used = buf[addr + 5], struct.unpack_from("<H", buf, addr + 6)[0]
    key_size = 8 + 8 * (rank + 1)
    p = addr + 24
    for _ in range(used):
        size, mask = struct.unpack_from("<II", buf, p)
        origin = struct.unpack_from(f"<{rank}Q", buf, p + 8)
        child = struct.unpack_from("<Q", buf, p + key_size)[0]
        if level == 0:
            yield origin, size, child, mask
        else:
            yield from _walk_chunk_btree(buf, child, rank)
        p += key_size + 8


def _fixed_array_chunks(buf: bytes, fahd: int, shape, chunks, nbytes: int):
    """Yield (origin, size, addr, mask) from a Fixed Array chunk index
    (layout v4 index type 3), paged or unpaged. Client 0 = unfiltered
    chunks (address-only elements), client 1 = filtered (address +
    stored size + filter mask)."""
    if buf[fahd:fahd + 4] != b"FAHD":
        raise ValueError("bad fixed-array header signature")
    client, entry_size, page_bits = buf[fahd + 5], buf[fahd + 6], buf[fahd + 7]
    max_n, dbaddr = struct.unpack_from("<QQ", buf, fahd + 8)
    if dbaddr == UNDEF or max_n == 0:
        return
    if buf[dbaddr:dbaddr + 4] != b"FADB":
        raise ValueError("bad fixed-array data block signature")
    p = dbaddr + 14  # sig(4) version(1) client(1) header addr(8)
    per = 1 << page_bits
    if max_n <= per:
        raw = buf[p:p + max_n * entry_size]
    else:
        npages = -(-max_n // per)
        bitmap = buf[p:p + (npages + 7) // 8]
        p += (npages + 7) // 8 + 4  # bitmap + data-block checksum
        parts = []
        remaining = max_n
        for i in range(npages):
            cnt = min(per, remaining)
            if bitmap[i // 8] >> (i % 8) & 1:
                parts.append(buf[p:p + cnt * entry_size])
            else:  # uninitialized page → all chunks unallocated
                parts.append(b"\xff" * (cnt * entry_size))
            p += cnt * entry_size + 4  # elements + page checksum
            remaining -= cnt
        raw = b"".join(parts)
    for i, origin in enumerate(_grid_origins(shape, chunks)):
        e = raw[i * entry_size:(i + 1) * entry_size]
        addr = int.from_bytes(e[:8], "little")
        if client == 1:
            szb = entry_size - 8 - 4
            size = int.from_bytes(e[8:8 + szb], "little")
            mask = int.from_bytes(e[8 + szb:], "little")
        else:
            size, mask = nbytes, 0
        yield origin, size, addr, mask


def _iter_messages(buf: bytes, addr: int):
    """Yield (type, body) for a v1 or v2 ("OHDR") object header,
    including continuation blocks."""
    if buf[addr:addr + 4] == b"OHDR":
        if buf[addr + 4] != 2:
            raise NotImplementedError(f"OHDR version {buf[addr + 4]}")
        yield from _iter_messages_v2(buf, addr)
        return
    if buf[addr] != 1:
        raise NotImplementedError(
            f"object header version {buf[addr]}")
    nmsg = struct.unpack_from("<H", buf, addr + 2)[0]
    size = struct.unpack_from("<I", buf, addr + 8)[0]
    spans = [(addr + 16, size)]
    got = 0
    while spans and got < nmsg:
        p, remaining = spans.pop(0)
        while remaining >= 8 and got < nmsg:
            mtype, msize, _flags = struct.unpack_from("<HHB", buf, p)
            body = buf[p + 8:p + 8 + msize]
            got += 1
            p += 8 + msize
            remaining -= 8 + msize
            if mtype == 0x0010:  # continuation
                c_off, c_len = struct.unpack_from("<QQ", body, 0)
                spans.append((c_off, c_len))
            else:
                yield mtype, body


def _iter_messages_v2(buf: bytes, addr: int):
    """Yield (type, body) for a v2 "OHDR" object header including
    "OCHK" continuation blocks. Tolerates optional time fields,
    storage phase-change fields, and per-message creation order."""
    flags = buf[addr + 5]
    p = addr + 6
    if flags & 0x20:
        p += 16  # access/mod/change/birth times
    if flags & 0x10:
        p += 4   # max-compact / min-dense attribute phase change
    csz = 1 << (flags & 0x3)
    size0 = int.from_bytes(buf[p:p + csz], "little")
    p += csz
    corder = 2 if flags & 0x04 else 0
    spans = [(p, size0)]
    while spans:
        q, remaining = spans.pop(0)
        while remaining >= 4 + corder:
            mtype = buf[q]
            msize = struct.unpack_from("<H", buf, q + 1)[0]
            if msize > remaining - 4 - corder:
                break  # gap / checksum residue at chunk end
            body = buf[q + 4 + corder:q + 4 + corder + msize]
            q += 4 + corder + msize
            remaining -= 4 + corder + msize
            if mtype == 0x10:  # continuation → OCHK block
                c_off, c_len = struct.unpack_from("<QQ", body, 0)
                if buf[c_off:c_off + 4] != b"OCHK":
                    raise ValueError("bad OCHK continuation signature")
                spans.append((c_off + 4, c_len - 8))  # sig + checksum
            else:
                yield mtype, body


def _parse_link(body: bytes) -> tuple[str, int] | None:
    """(name, object header addr) from a hard-link message; None for
    soft/external links (not needed by any granule layout)."""
    if body[0] != 1:
        return None
    flags = body[1]
    p = 2
    ltype = 0
    if flags & 0x08:
        ltype = body[p]
        p += 1
    if flags & 0x04:
        p += 8  # creation order
    if flags & 0x10:
        p += 1  # charset
    lsz = 1 << (flags & 0x3)
    nlen = int.from_bytes(body[p:p + lsz], "little")
    p += lsz
    name = body[p:p + nlen].decode()
    p += nlen
    if ltype != 0:
        return None
    return name, struct.unpack_from("<Q", body, p)[0]


def _parse_attr(body: bytes) -> tuple[str, object] | None:
    try:
        version = body[0]
        if version == 1:
            name_size, dt_size, ds_size = struct.unpack_from("<HHH", body, 2)
            p = 8
            name = body[p:p + name_size].split(b"\x00")[0].decode()
            p += -(-name_size // 8) * 8
            dt = _parse_dtype(body[p:p + dt_size])
            p += -(-dt_size // 8) * 8
            shape = _parse_dataspace(body[p:p + ds_size])
            p += -(-ds_size // 8) * 8
        elif version in (2, 3):
            if body[1] & 0x03:
                return None  # shared datatype/dataspace
            name_size, dt_size, ds_size = struct.unpack_from("<HHH", body, 2)
            p = 8 + (1 if version == 3 else 0)  # v3: charset byte
            name = body[p:p + name_size].split(b"\x00")[0].decode()
            p += name_size  # v2/v3 fields are NOT 8-byte padded
            dt = _parse_dtype(body[p:p + dt_size])
            p += dt_size
            shape = _parse_dataspace(body[p:p + ds_size])
            p += ds_size
        else:
            return None
        n = int(np.prod(shape)) if shape else 1
        vals = np.frombuffer(body, dt, count=n, offset=p)
        if dt.kind == "S":
            out = [v.split(b"\x00")[0].decode("ascii", "replace")
                   for v in vals]
        else:
            out = list(vals)
        return name, (out[0] if not shape else out)
    except Exception:
        return None  # tolerate vlen/compound/etc. attributes


class _FractalHeap:
    """Read-side fractal heap: maps managed heap IDs to bytes. Covers
    a root direct block, a root indirect block over direct blocks,
    and nested indirect blocks to any doubling-table depth (recursive
    _map_indirect); filtered heaps and huge/tiny object IDs raise."""

    def __init__(self, buf: bytes, addr: int):
        if buf[addr:addr + 4] != b"FRHP":
            raise ValueError("bad fractal heap signature")
        self._buf = buf
        self.id_len, self.filter_len = struct.unpack_from("<HH", buf,
                                                          addr + 5)
        if self.filter_len:
            raise NotImplementedError("filtered fractal heap")
        self.width = struct.unpack_from("<H", buf, addr + 110)[0]
        self.start_size, self.max_direct = struct.unpack_from(
            "<QQ", buf, addr + 112)
        max_heap_bits, _start_rows = struct.unpack_from(
            "<HH", buf, addr + 128)
        self.root_addr = struct.unpack_from("<Q", buf, addr + 132)[0]
        self.cur_rows = struct.unpack_from("<H", buf, addr + 140)[0]
        self.offb = -(-max_heap_bits // 8)
        self._blocks: list[tuple[int, int, int]] = []  # (off, size, faddr)
        if self.cur_rows == 0:
            self._blocks.append((0, self.start_size, self.root_addr))
        else:
            self._map_indirect(self.root_addr, self.cur_rows)

    def _map_indirect(self, addr: int, nrows: int,
                      base_off: int = 0) -> None:
        """Map one indirect block's doubling table. Rows below
        ``max_direct_rows`` hold direct blocks; higher rows hold CHILD
        indirect blocks, each covering that row's block size of heap
        offset space via its own doubling table (nrows of a child
        covering S bytes = log2(S) - log2(start_size*width) + 1, the
        libhdf5 H5HFiblock rule) — recursion handles any heap size."""
        buf = self._buf
        if buf[addr:addr + 4] != b"FHIB":
            raise ValueError("bad fractal heap indirect block signature")
        max_direct_rows = (self.max_direct.bit_length()
                           - self.start_size.bit_length() + 2)
        sw_bits = (self.start_size * self.width).bit_length()
        p = addr + 4 + 1 + 8 + self.offb
        off = base_off
        for row in range(nrows):
            size = (self.start_size if row < 2
                    else self.start_size << (row - 1))
            for _ in range(self.width):
                child = struct.unpack_from("<Q", buf, p)[0]
                p += 8
                if child != UNDEF:
                    if row < max_direct_rows:
                        self._blocks.append((off, size, child))
                    else:
                        self._map_indirect(
                            child, size.bit_length() - sw_bits + 1, off)
                off += size

    def get(self, off: int, length: int) -> bytes:
        for boff, size, faddr in self._blocks:
            if boff <= off < boff + size:
                at = faddr + (off - boff)
                return self._buf[at:at + length]
        raise ValueError("fractal heap offset out of mapped range")

    def read_id(self, hid: bytes) -> bytes:
        typ = (hid[0] >> 4) & 0x3
        if typ != 0:
            raise NotImplementedError(
                f"fractal heap object type {typ} (huge/tiny)")
        off = int.from_bytes(hid[1:1 + self.offb], "little")
        ln = int.from_bytes(hid[1 + self.offb:self.id_len], "little")
        return self.get(off, ln)


def _bt2_records(buf: bytes, addr: int) -> tuple[int, int, list[bytes]]:
    """(record type, record size, raw records) from a v2 B-tree of
    depth ≤ 1 (covers dense groups up to tens of thousands of links)."""
    if buf[addr:addr + 4] != b"BTHD":
        raise ValueError("bad v2 B-tree header signature")
    ntype = buf[addr + 5]
    node_size = struct.unpack_from("<I", buf, addr + 6)[0]
    rec_size, depth = struct.unpack_from("<HH", buf, addr + 10)
    root_addr = struct.unpack_from("<Q", buf, addr + 16)[0]
    root_nrec = struct.unpack_from("<H", buf, addr + 24)[0]
    if depth > 1:
        raise NotImplementedError("v2 B-tree depth > 1")

    def leaf(a: int, n: int) -> list[bytes]:
        if buf[a:a + 4] != b"BTLF":
            raise ValueError("bad v2 B-tree leaf signature")
        return [buf[a + 6 + i * rec_size:a + 6 + (i + 1) * rec_size]
                for i in range(n)]

    if depth == 0:
        return ntype, rec_size, leaf(root_addr, root_nrec)
    if buf[root_addr:root_addr + 4] != b"BTIN":
        raise ValueError("bad v2 B-tree internal node signature")
    max_leaf = (node_size - 10) // rec_size
    nb = max(1, (max_leaf.bit_length() + 7) // 8)
    q = root_addr + 6
    seps = [buf[q + i * rec_size:q + (i + 1) * rec_size]
            for i in range(root_nrec)]
    q += root_nrec * rec_size
    recs: list[bytes] = []
    for i in range(root_nrec + 1):
        ca = struct.unpack_from("<Q", buf, q)[0]
        cn = int.from_bytes(buf[q + 8:q + 8 + nb], "little")
        q += 8 + nb
        recs += leaf(ca, cn)
        if i < root_nrec:
            recs.append(seps[i])
    return ntype, rec_size, recs


def _read_dense_links(buf: bytes, fheap_addr: int,
                      btree_addr: int) -> dict[str, int]:
    """{name: object header addr} from dense link storage (Link Info
    message → fractal heap of link messages + v2 B-tree name index)."""
    heap = _FractalHeap(buf, fheap_addr)
    _ntype, _rec_size, recs = _bt2_records(buf, btree_addr)
    links: dict[str, int] = {}
    for rec in recs:  # type-5 record: hash(4) + heap id
        kv = _parse_link(heap.read_id(rec[4:]))
        if kv:
            links[kv[0]] = kv[1]
    return links


def _read_dense_attrs(buf: bytes, fheap_addr: int,
                      btree_addr: int) -> dict:
    """Dense attribute storage (Attribute Info → fractal heap of
    attribute messages). Attributes are never fatal: failures yield {}."""
    try:
        heap = _FractalHeap(buf, fheap_addr)
        _ntype, _rec_size, recs = _bt2_records(buf, btree_addr)
        attrs: dict = {}
        for rec in recs:  # type-8 record: heap id(8) flags(1) ...
            kv = _parse_attr(heap.read_id(rec[:8]))
            if kv:
                attrs[kv[0]] = kv[1]
        return attrs
    except Exception:
        return {}


def _parse_object(buf: bytes, addr: int, depth: int = 0):
    if depth > 32:
        raise ValueError("HDF5 group nesting too deep (cycle?)")
    shape = dtype = None
    layout = None
    filters: list[tuple[int, list[int]]] = []
    symtab = None
    links: dict[str, int] = {}
    dense_links: tuple[int, int] | None = None
    new_group = False
    attrs: dict = {}
    for mtype, body in _iter_messages(buf, addr):
        if mtype == 0x0001:
            shape = _parse_dataspace(body)
        elif mtype == 0x0003:
            dtype = _parse_dtype(body)
        elif mtype == 0x0008:
            version = body[0]
            if version == 3:
                lclass = body[1]
                if lclass == 1:
                    a, s = struct.unpack_from("<QQ", body, 2)
                    layout = ("contiguous", a, s)
                elif lclass == 2:
                    ndims = body[2]
                    btree = struct.unpack_from("<Q", body, 3)[0]
                    dims = struct.unpack_from(f"<{ndims}I", body, 11)
                    layout = ("chunked", btree, tuple(dims[:-1]))
                elif lclass == 0:  # compact
                    s = struct.unpack_from("<H", body, 2)[0]
                    layout = ("compact", body[4:4 + s])
                else:
                    raise NotImplementedError(f"data layout class {lclass}")
            elif version == 4:
                layout = _parse_layout_v4(body)
            else:
                raise NotImplementedError(f"data layout version {version}")
        elif mtype == 0x000B:
            version = body[0]
            nf = body[1]
            p = 8 if version == 1 else 2
            for _ in range(nf):
                fid, nlen, _fl, ncl = struct.unpack_from("<HHHH", body, p)
                p += 8
                if version == 1 or nlen:
                    p += -(-nlen // 8) * 8
                cvals = list(struct.unpack_from(f"<{ncl}I", body, p))
                p += 4 * ncl
                if version == 1 and ncl % 2:
                    p += 4
                filters.append((fid, cvals))
        elif mtype == 0x0011:
            symtab = struct.unpack_from("<QQ", body, 0)
        elif mtype == 0x0002:  # Link Info → new-style group
            new_group = True
            p = 2 + (8 if body[1] & 1 else 0)
            fheap, name_bt = struct.unpack_from("<QQ", body, p)
            if fheap != UNDEF:
                dense_links = (fheap, name_bt)
        elif mtype == 0x0006:  # compact link message
            new_group = True
            kv = _parse_link(body)
            if kv:
                links[kv[0]] = kv[1]
        elif mtype == 0x000A:  # group info
            new_group = True
        elif mtype == 0x0015:  # attribute info → dense attributes
            p = 2 + (2 if body[1] & 1 else 0)
            fheap, name_bt = struct.unpack_from("<QQ", body, p)
            if fheap != UNDEF:
                attrs.update(_read_dense_attrs(buf, fheap, name_bt))
        elif mtype == 0x000C:
            kv = _parse_attr(body)
            if kv:
                attrs[kv[0]] = kv[1]
    if symtab is not None or new_group:
        entries = {}
        if symtab is not None:
            btree, heap = symtab
            heap_seg = struct.unpack_from("<Q", buf, heap + 24)[0]
            for name_off, child in _walk_group_btree(buf, btree):
                end = buf.index(b"\x00", heap_seg + name_off)
                name = buf[heap_seg + name_off:end].decode()
                entries[name] = _parse_object(buf, child, depth + 1)
        if dense_links is not None:
            links = {**links, **_read_dense_links(buf, *dense_links)}
        for name, child in links.items():
            entries[name] = _parse_object(buf, child, depth + 1)
        return H5Group(entries, attrs)
    if shape is None or dtype is None or layout is None:
        raise ValueError(f"object at {addr:#x} is neither group nor "
                         "readable dataset")
    if layout[0] == "compact":
        arr = np.frombuffer(layout[1], dtype,
                            count=int(np.prod(shape)) if shape else 1)
        return H5Dataset(arr.reshape(shape).tobytes(), shape, dtype,
                         ("contiguous", 0, arr.nbytes), attrs)
    if layout[0].startswith("chunked"):
        layout = layout + (filters,)
    return H5Dataset(buf, shape, dtype, layout, attrs)


def _parse_layout_v4(body: bytes):
    """Data Layout message version 4 (HDF5 1.10 "latest"): same
    contiguous/compact classes, chunked with the new chunk indexes."""
    lclass = body[1]
    if lclass == 0:
        s = struct.unpack_from("<H", body, 2)[0]
        return ("compact", body[4:4 + s])
    if lclass == 1:
        a, s = struct.unpack_from("<QQ", body, 2)
        return ("contiguous", a, s)
    if lclass != 2:
        raise NotImplementedError(f"data layout v4 class {lclass}")
    lflags, ndims, enc = body[2], body[3], body[4]
    p = 5
    dims = tuple(int.from_bytes(body[p + i * enc:p + (i + 1) * enc],
                                "little") for i in range(ndims))
    p += ndims * enc
    idx = body[p]
    p += 1
    if idx == 1:  # single chunk
        fsize, mask = None, 0
        if lflags & 2:
            fsize = struct.unpack_from("<Q", body, p)[0]
            mask = struct.unpack_from("<I", body, p + 8)[0]
            p += 12
        a = struct.unpack_from("<Q", body, p)[0]
        return ("chunked_single", a, dims, fsize, mask)
    if idx == 2:  # implicit (early-allocated, unfiltered)
        return ("chunked_implicit", struct.unpack_from("<Q", body, p)[0],
                dims)
    if idx == 3:  # fixed array
        p += 1  # page bits (re-read from the FAHD header)
        return ("chunked_farr", struct.unpack_from("<Q", body, p)[0], dims)
    if idx == 4:
        raise NotImplementedError(
            "extensible-array chunk index (unlimited-maxshape dataset) "
            "— install h5py to read this file")
    if idx == 5:
        raise NotImplementedError(
            "v2 B-tree chunk index (multi-unlimited dataset) — install "
            "h5py to read this file")
    raise NotImplementedError(f"chunk index type {idx}")


def _walk_group_btree(buf: bytes, addr: int):
    """Yield (heap name offset, object header addr) from a v1 group
    B-tree (node type 0) of any depth, via SNOD symbol nodes."""
    if buf[addr:addr + 4] != b"TREE":
        raise ValueError("bad group B-tree node signature")
    ntype, level = buf[addr + 4], buf[addr + 5]
    used = struct.unpack_from("<H", buf, addr + 6)[0]
    p = addr + 24
    for _ in range(used):
        child = struct.unpack_from("<Q", buf, p + 8)[0]
        if level > 0:
            yield from _walk_group_btree(buf, child)
        else:
            if buf[child:child + 4] != b"SNOD":
                raise ValueError("bad symbol node signature")
            n = struct.unpack_from("<H", buf, child + 6)[0]
            q = child + 8
            for _ in range(n):
                name_off, oh = struct.unpack_from("<QQ", buf, q)
                yield name_off, oh
                q += 40
        p += 16


def read_h5(path: str) -> H5Group:
    """Open an HDF5 file; returns the root group. The whole file is
    read into memory — granule-sized files (the unit of distribution)
    are hundreds of MB, well inside an executor task."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if buf[:8] != _SIG:
        raise ValueError("not an HDF5 file (bad signature)")
    version = buf[8]
    if version in (0, 1):
        # v0: fixed prefix of 24 bytes, then 4 addresses; v1 inserts
        # 2+2 bytes of indexed-storage K before the addresses
        off = 24 if version == 0 else 28
        off += 32  # base, free-space, EOF, driver-info
        root_oh = struct.unpack_from("<Q", buf, off + 8)[0]
    elif version in (2, 3):
        # "latest format" (HDF5 1.10+ / SWMR): sig, version,
        # offset/length sizes, flags, then base / extension / EOF /
        # root-header addresses and a checksum
        if buf[9] != 8 or buf[10] != 8:
            raise NotImplementedError(
                f"superblock v{version} with {buf[9]}/{buf[10]}-byte "
                "offsets/lengths (only 8/8 supported)")
        root_oh = struct.unpack_from("<Q", buf, 36)[0]
    else:
        raise NotImplementedError(
            f"superblock version {version} — newer than the HDF5 3.0 "
            "file format spec this codec implements")
    root = _parse_object(buf, root_oh)
    if not isinstance(root, H5Group):
        raise ValueError("root object is not a group")
    return root


def load_fields(path: str, paths: list[str]) -> dict[str, np.ndarray]:
    """{h5-path: array} for every requested dataset path that exists —
    the flat mapping the converter transform layers consume."""
    root = read_h5(path)
    out = {}
    for p in paths:
        try:
            node = root[p]
        except KeyError:
            continue
        if isinstance(node, H5Dataset):
            out[p] = node[...]
    return out


# ===========================================================================
# H5 export sinks (S10/S11 true-format parity)
# ===========================================================================

def write_h5_points(df, path: str, group: str | None = None,
                    compress: int = 4, attrs: dict | None = None) -> None:
    """S10 H5 sink in the reference's actual format: one gzip'd
    dataset per field under an optional group (point_data.to_file,
    point_data.py:254-266). A raster/point FILE is a single driver
    artifact (like the GeoTIFF sink): the input should be a finished
    derived product — a tile, a crossover table — not a raw corpus;
    the driver payload is exactly the rows written."""
    pdf = df.toPandas()
    cols = {c: dataset(pdf[c].to_numpy(), compress=compress,
                       chunks=(max(1, min(len(pdf), 65536)),))
            for c in pdf.columns
            if pdf[c].dtype.kind in "iuf"}
    tree = {group: cols} if group else cols
    write_h5(path, tree, attrs or {})


def write_h5_tile(df, path: str, x: str = "bin_x", y: str = "bin_y",
                  order: str | None = "delta_time",
                  compress: int = 4,
                  max_rows: int | None = 20_000_000) -> None:
    """S11 tile sink in the reference's actual format: one H5 group
    per 10-km bin named ``"%dE_%dN"``, rows sorted by (bin, time)
    (make_tile write loop, ATL06_tiles.py:81-106).

    Contract: a single-file H5 tile is a DRIVER artifact — the sort
    runs distributed, but the full input collects to the driver for
    the one-pass file write (the reference is also single-process
    here). A tile is the reference's per-process work unit, bounded
    by construction; ``max_rows`` (explicit count-guard, default
    20M) rejects a corpus-sized frame with a clear error instead of
    OOMing the driver. For corpus-scale data use
    ``tile_store.write_tiles`` (distributed partitioned parquet);
    pass ``max_rows=None`` to skip the guard's extra count job."""
    if max_rows is not None:
        n = df.count()
        if n > max_rows:
            raise ValueError(
                f"write_h5_tile: input has {n} rows > max_rows="
                f"{max_rows}. A single-file H5 tile collects to the "
                "driver; this frame is not tile-sized. Use "
                "tile_store.write_tiles for distributed output, or "
                "raise max_rows explicitly.")
    sort_cols = [x, y] + ([order] if order else [])
    pdf = df.orderBy(*sort_cols).toPandas()
    write_h5(path, _bin_group_tree(pdf, x, y, compress))


def _bin_group_tree(pdf, x: str, y: str, compress: int) -> dict:
    """The per-bin ``"%dE_%dN"`` group tree of a SORTED pandas frame —
    shared between the driver-side single-file sink and the
    distributed per-tile writer so both produce bitwise-identical
    datasets for the same rows."""
    tree: dict = {}
    for (bx, by), rows in pdf.groupby([x, y], sort=True):
        name = "%dE_%dN" % (int(bx), int(by))
        tree[name] = {
            c: dataset(rows[c].to_numpy(),
                       compress=compress,
                       chunks=(max(1, min(len(rows), 65536)),))
            for c in rows.columns if rows[c].dtype.kind in "iuf"}
    return tree


def write_h5_tiles(df, out_dir: str, tile_x: str = "tile_x",
                   tile_y: str = "tile_y", x: str = "bin_x",
                   y: str = "bin_y", order: str | None = "delta_time",
                   compress: int = 4,
                   name_fmt: str = "E%d_N%d.h5") -> list:
    """S11 tile sink, DISTRIBUTED: one true-format H5 file per
    (``tile_x``, ``tile_y``) group, fanned out via applyInPandas so
    each executor task writes exactly one tile with the same pure-
    Python codec as the driver-side sink (reference write loop:
    ATL06_tiles.py:99-106 — one process per tile; here one TASK per
    tile). ``out_dir`` must be a filesystem visible to executors (a
    shared FS on a real cluster; local disk under local[*]).

    Rows are sorted (``x``, ``y``, ``order``) inside each task —
    identical to :func:`write_h5_tile`'s global orderBy restricted
    to the tile, so per-tile files are byte-identical to the
    driver-side writer given a tie-free ``order`` column; NULLs sort
    first on both paths (``na_position="first"`` mirrors Spark's
    asc-nulls-first), but a genuine NaN VALUE sorts last in Spark
    and is indistinguishable from NULL after Arrow transfer — keep
    the sort columns non-null/non-NaN for strict byte parity. The
    tile key columns are bookkeeping, not data: they are dropped
    before writing (unless they double as ``x``/``y``/``order``).

    Eager (it is a sink): returns the collected per-tile summary
    rows ``(tile_x, tile_y, n_rows, path)``. At scale the shuffle
    carries each row once, keyed by tile — the same exchange the
    parquet tile store pays — and file writes are embarrassingly
    parallel."""
    import os

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    sort_cols = [x, y] + ([order] if order else [])
    keep = set(sort_cols)
    drop_cols = [c for c in (tile_x, tile_y) if c not in keep]

    def _write_one(key, pdf):
        tx, ty = int(key[0]), int(key[1])
        # na_position="first" mirrors Spark orderBy's asc-nulls-first
        # — without it a null in a sort column would land LAST here
        # but FIRST in the driver-side writer, breaking byte-identity.
        rows = (pdf.drop(columns=drop_cols)
                .sort_values(sort_cols, kind="mergesort",
                             na_position="first", ignore_index=True))
        path = os.path.join(out_dir, name_fmt % (tx, ty))
        write_h5(path, _bin_group_tree(rows, x, y, compress))
        return pd.DataFrame([{"tile_x": tx, "tile_y": ty,
                              "n_rows": len(rows), "path": path}])

    out = (df.groupBy(tile_x, tile_y)
           .applyInPandas(_write_one,
                          "tile_x long, tile_y long, n_rows long, "
                          "path string"))
    return out.collect()
