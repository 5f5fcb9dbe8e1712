"""S2ShapeIndex wire format (s2shape_index.cc:69-372 cell coding,
mutable_s2shape_index.cc:1988-2054 index coding).

Encodes/decodes the reference's index snapshot byte-for-byte:

- S2ShapeIndexCell::Encode/Decode — per-cell clipped shapes with the
  three compact single-shape encodings (contiguous-range / one-edge /
  general), delta-coded shape ids, and the (edge_id, count) run-length
  edge coding.
- MutableS2ShapeIndex::Encode/Init — varint64(max_edges << 2 | version)
  + EncodedS2CellIdVector of cell ids + EncodedStringVector of cells.

Cells here are the kernel index structure of mutable_index.MutableIndex:
(cell_id: CID, clipped) with clipped = [(shape_id, contains_center,
edge_ids tuple)].
"""

from __future__ import annotations

from .cid import CID
from .encoded_vectors import (
    EncodedS2CellIdVector,
    EncodedStringVector,
    StringVectorEncoder,
    encode_s2cellid_vector,
)
from .encodings import Decoder, Encoder

CURRENT_ENCODING_VERSION = 0  # mutable_s2shape_index.h:458


def _encode_edges(edge_ids, enc: Encoder) -> None:
    """EncodeEdges (s2shape_index.cc:290-329): (delta, count) runs,
    no count on the final edge."""
    edge_id_base = 0
    num_edges = len(edge_ids)
    i = 0
    while i < num_edges:
        edge_id = edge_ids[i]
        delta = edge_id - edge_id_base
        if i + 1 == num_edges:
            enc.put_varint32(delta)
            i += 1
        else:
            count = 1
            while (i + 1 < num_edges
                   and edge_ids[i + 1] == edge_id + count):
                i += 1
                count += 1
            if count < 8:
                enc.put_varint32(delta << 3 | (count - 1))
            else:
                enc.put_varint32((count - 8) << 3 | 7)
                enc.put_varint32(delta)
            edge_id_base = edge_id + count
            i += 1


def _decode_edges(num_edges: int, dec: Decoder) -> list[int]:
    """DecodeEdges (s2shape_index.cc:331-372)."""
    out: list[int] = []
    edge_id = 0
    while len(out) < num_edges:
        delta = dec.get_varint32()
        if len(out) + 1 == num_edges:
            edge_id += delta
            out.append(edge_id)
        else:
            count = (delta & 7) + 1
            delta >>= 3
            if count == 8:
                count = delta + 8
                delta = dec.get_varint32()
            if len(out) + count > num_edges:
                raise ValueError("edge count overflow")
            edge_id += delta
            for _ in range(count):
                out.append(edge_id)
                edge_id += 1
    return out


def encode_index_cell(clipped, num_shape_ids: int, enc: Encoder) -> None:
    """S2ShapeIndexCell::Encode (s2shape_index.cc:69-190)."""
    if num_shape_ids == 1:
        # Single-shape index: no shape ids needed.
        assert len(clipped) == 1
        shape_id, contains_center, edge_ids = clipped[0]
        assert shape_id == 0
        n = len(edge_ids)
        if n >= 2 and n <= 17 and edge_ids[-1] - edge_ids[0] == n - 1:
            enc.put_varint64(edge_ids[0] << 6 | (n - 2) << 2
                             | int(contains_center) << 1 | 0)
        elif n == 1:
            enc.put_varint64(edge_ids[0] << 3
                             | int(contains_center) << 2 | 1)
        else:
            enc.put_varint64(n << 3 | int(contains_center) << 2 | 3)
            _encode_edges(edge_ids, enc)
    else:
        if len(clipped) > 1:
            enc.put_varint32(len(clipped) << 3 | 3)
        shape_id_base = 0
        for shape_id, contains_center, edge_ids in clipped:
            shape_delta = shape_id - shape_id_base
            shape_id_base = shape_id + 1
            n = len(edge_ids)
            if n >= 1 and n <= 16 and edge_ids[-1] - edge_ids[0] == n - 1:
                enc.put_varint32(edge_ids[0] << 2
                                 | int(contains_center) << 1 | 0)
                enc.put_varint32(shape_delta << 4 | (n - 1))
            elif n == 0:
                enc.put_varint32(shape_delta << 4
                                 | int(contains_center) << 3 | 7)
            else:
                enc.put_varint32((n - 1) << 3
                                 | int(contains_center) << 2 | 1)
                enc.put_varint32(shape_delta)
                _encode_edges(edge_ids, enc)


def decode_index_cell(num_shape_ids: int, dec: Decoder):
    """S2ShapeIndexCell::Decode (s2shape_index.cc:192-287)."""
    # the reference does not handle num_shapes >= 2**28 or
    # num_edges >= 2**29 (s2shape_index.cc:86-89); rejecting larger
    # decoded counts also bounds memory on corrupt input
    max_edges = 1 << 29
    clipped = []
    if num_shape_ids == 1:
        header = dec.get_varint64()
        if (header & 1) == 0:
            num_edges = ((header >> 2) & 15) + 2
            edge_id = header >> 6
            if edge_id + num_edges > 0x7FFFFFFF:
                raise ValueError("edge id overflow")
            clipped.append(
                (0, (header & 2) != 0,
                 tuple(range(edge_id, edge_id + num_edges))))
        elif (header & 2) == 0:
            if header >> 3 > 0x7FFFFFFF:
                raise ValueError("edge id overflow")
            clipped.append((0, (header & 4) != 0, (header >> 3,)))
        else:
            num_edges = header >> 3
            if num_edges >= max_edges:
                raise ValueError("edge count overflow")
            contains_center = (header & 4) != 0
            clipped.append(
                (0, contains_center, tuple(_decode_edges(num_edges, dec))))
        return clipped

    header = dec.get_varint32()
    num_clipped = 1
    if (header & 7) == 3:
        num_clipped = header >> 3
        if num_clipped >= (1 << 28):
            raise ValueError("clipped count overflow")
        header = dec.get_varint32()
    shape_id = 0
    for j in range(num_clipped):
        if j > 0:
            header = dec.get_varint32()
        if (header & 1) == 0:
            shape_id_count = dec.get_varint32()
            shape_id += shape_id_count >> 4
            num_edges = (shape_id_count & 15) + 1
            edge_id = header >> 2
            if edge_id + num_edges > 0x7FFFFFFF:
                raise ValueError("edge id overflow")
            clipped.append(
                (shape_id, (header & 2) != 0,
                 tuple(range(edge_id, edge_id + num_edges))))
        elif (header & 7) == 7:
            shape_id += header >> 4
            clipped.append((shape_id, (header & 8) != 0, ()))
        else:
            if (header & 3) != 1:
                raise ValueError("bad clipped-shape tag")
            shape_id += dec.get_varint32()
            num_edges = (header >> 3) + 1
            clipped.append(
                (shape_id, (header & 4) != 0,
                 tuple(_decode_edges(num_edges, dec))))
        shape_id += 1
    return clipped


def encode_shape_index(cells, num_shape_ids: int, enc: Encoder,
                       max_edges_per_cell: int = 10) -> None:
    """MutableS2ShapeIndex::Encode (mutable_s2shape_index.cc:1988-2008):
    the index portion only (shapes are encoded separately, as in the
    reference's two-step CompactEncodeTaggedShapes + index.Encode)."""
    enc.put_varint64(max_edges_per_cell << 2 | CURRENT_ENCODING_VERSION)
    cell_ids = [c[0].id if isinstance(c[0], CID) else int(c[0])
                for c in cells]
    encoded_cells = StringVectorEncoder()
    for _cid, clipped in cells:
        sub = encoded_cells.add_via_encoder()
        encode_index_cell(clipped, num_shape_ids, sub)
    encode_s2cellid_vector(cell_ids, enc)
    encoded_cells.encode(enc)


def decode_shape_index(dec: Decoder, num_shape_ids: int,
                       ) -> tuple[int, list]:
    """MutableS2ShapeIndex::Init (mutable_s2shape_index.cc:2010-2046):
    returns (max_edges_per_cell, cells) with cells in the kernel index
    structure."""
    max_edges_version = dec.get_varint64()
    version = max_edges_version & 3
    if version != CURRENT_ENCODING_VERSION:
        raise ValueError(f"unsupported index encoding version {version}")
    max_edges = max_edges_version >> 2
    cell_ids = EncodedS2CellIdVector()
    if not cell_ids.init(dec):
        raise ValueError("bad cell-id vector")
    encoded_cells = EncodedStringVector()
    if not encoded_cells.init(dec):
        raise ValueError("bad cell vector")
    cells = []
    for i in range(len(cell_ids)):
        cell_dec = Decoder(encoded_cells[i])
        cells.append((CID(cell_ids[i]),
                      decode_index_cell(num_shape_ids, cell_dec)))
    return max_edges, cells
