"""zarr-v2 DirectoryStore reader (data/zarr_io.py) against hand-written
stores following the zarr v2 spec + c-blosc1 chunk format — the formats the
reference's pseudo-GT mask stores use (kitti_car.py:275-288, zarr.save
defaults = Blosc lz4/shuffle). zarr itself is not installed, so the fixtures
are constructed byte-by-byte from the specs."""
import json
import os
import struct
import zlib

import numpy as np
import pytest

from disprcnn_tpu.data.zarr_io import (
    blosc_decompress,
    load_zarr,
    lz4_decompress_block,
)


def _write_store(tmp, meta, chunks_bytes):
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, ".zarray"), "w") as f:
        json.dump(meta, f)
    for key, data in chunks_bytes.items():
        with open(os.path.join(tmp, key), "wb") as f:
            f.write(data)


def _meta(shape, chunks, dtype, compressor, order="C", fill=0, **kw):
    m = dict(
        zarr_format=2, shape=list(shape), chunks=list(chunks), dtype=dtype,
        compressor=compressor, order=order, fill_value=fill, filters=None,
    )
    m.update(kw)
    return m


def test_raw_store_multichunk_edges(tmp_path):
    arr = np.arange(7 * 5, dtype="<i4").reshape(7, 5)
    ch = (3, 4)
    chunks = {}
    for i in range(3):
        for j in range(2):
            block = np.zeros(ch, "<i4")
            part = arr[i * 3 : (i + 1) * 3, j * 4 : (j + 1) * 4]
            block[: part.shape[0], : part.shape[1]] = part
            chunks[f"{i}.{j}"] = block.tobytes()
    p = str(tmp_path / "raw.zarr")
    _write_store(p, _meta(arr.shape, ch, "<i4", None), chunks)
    np.testing.assert_array_equal(load_zarr(p), arr)


def test_zlib_store_missing_chunk_fill_and_forder(tmp_path):
    arr = np.arange(6 * 4, dtype="<f4").reshape(6, 4)
    ch = (3, 4)
    chunks = {"0.0": zlib.compress(np.asfortranarray(arr[:3]).tobytes(order="F"))}
    # chunk (1, 0) deliberately missing -> fill_value
    p = str(tmp_path / "zl.zarr")
    _write_store(p, _meta(arr.shape, ch, "<f4", {"id": "zlib", "level": 1},
                          order="F", fill=-1.0), chunks)
    got = load_zarr(p)
    np.testing.assert_array_equal(got[:3], arr[:3])
    np.testing.assert_array_equal(got[3:], np.full((3, 4), -1.0, "<f4"))


def _blosc_header(flags, typesize, nbytes, blocksize, cbytes):
    return bytes([2, 1, flags, typesize]) + struct.pack("<III", nbytes, blocksize, cbytes)


def test_blosc_memcpy_chunk(tmp_path):
    arr = (np.arange(40) % 3 == 0).astype("|b1")
    payload = arr.tobytes()
    chunk = _blosc_header(0x2, 1, len(payload), len(payload), 16 + len(payload)) + payload
    p = str(tmp_path / "bm.zarr")
    _write_store(p, _meta(arr.shape, arr.shape, "|b1",
                          {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1}),
                 {"0": chunk})
    np.testing.assert_array_equal(load_zarr(p), arr)


def _lz4_rle(data: bytes) -> bytes:
    """Valid LZ4 block for data that repeats its first 4 bytes: 4 literals +
    one long overlapping match + >= 5 tail literals (end-of-block rule)."""
    assert len(data) >= 16 and data == (data[:4] * (len(data) // 4))[: len(data)]
    tail = 5
    mlen = len(data) - 4 - tail
    out = bytearray()
    token_ml = mlen - 4
    out.append((4 << 4) | min(token_ml, 15))
    out += data[:4]
    out += struct.pack("<H", 4)  # match offset
    if token_ml >= 15:
        rem = token_ml - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out.append(tail << 4)  # final literal-only sequence
    out += data[-tail:]
    return bytes(out)


def test_lz4_block_roundtrip():
    data = bytes(range(4)) * 64
    enc = _lz4_rle(data)
    assert len(enc) < len(data)
    assert lz4_decompress_block(enc, len(data)) == data


def test_blosc_lz4_chunk_two_blocks(tmp_path):
    """Compressed blosc chunk: 2 blocks, lz4 codec, typesize 1 (the mask
    dtype), absolute bstarts, per-stream 4-byte csize prefixes."""
    blocksize = 256
    b0 = bytes([7, 1, 9, 3]) * 64
    b1 = bytes([5, 5, 5, 5]) * 48  # partial last block (192 bytes)
    payload = b0 + b1
    arr = np.frombuffer(payload, "|u1")
    s0, s1 = _lz4_rle(b0), _lz4_rle(b1)
    header_len = 16 + 2 * 4
    bstarts = [header_len, header_len + 4 + len(s0)]
    chunk = bytearray(_blosc_header(1 << 5, 1, len(payload), blocksize, 0))
    chunk += struct.pack("<2I", *bstarts)
    chunk += struct.pack("<I", len(s0)) + s0
    chunk += struct.pack("<I", len(s1)) + s1
    got = blosc_decompress(bytes(chunk))
    assert got == payload
    p = str(tmp_path / "bl.zarr")
    _write_store(p, _meta(arr.shape, arr.shape, "|u1", {"id": "blosc"}), {"0": bytes(chunk)})
    np.testing.assert_array_equal(load_zarr(p), arr)


def test_blosc_shuffle_split_raw_streams():
    """typesize=4 + byte shuffle + split: 4 byte-plane streams (stored raw,
    csize == neblock) reassemble and unshuffle to the original items."""
    n = 256  # elements; blocksize/typesize = 256 >= MIN_BUFFERSIZE
    arr = (np.arange(n, dtype="<u4") * 2654435761) & 0xFFFFFFFF
    arr = arr.astype("<u4")
    payload = arr.tobytes()
    shuffled = np.frombuffer(payload, np.uint8).reshape(n, 4).T.tobytes()
    neblock = len(payload) // 4
    header_len = 16 + 4
    chunk = bytearray(
        _blosc_header(0x1 | (1 << 5), 4, len(payload), len(payload), 0)
    )
    chunk += struct.pack("<I", header_len)
    for k in range(4):
        chunk += struct.pack("<I", neblock)
        chunk += shuffled[k * neblock : (k + 1) * neblock]
    got = blosc_decompress(bytes(chunk))
    assert got == payload


def test_group_layout_arr0(tmp_path):
    arr = np.ones((3, 3), "<f4")
    root = tmp_path / "g.zarr"
    os.makedirs(root)
    with open(root / ".zgroup", "w") as f:
        json.dump({"zarr_format": 2}, f)
    _write_store(str(root / "arr_0"), _meta(arr.shape, arr.shape, "<f4", None),
                 {"0.0": arr.tobytes()})
    np.testing.assert_array_equal(load_zarr(str(root)), arr)


def test_unsupported_codec_raises(tmp_path):
    chunk = _blosc_header(0 << 5, 1, 8, 8, 0) + b"\x00" * 16
    with pytest.raises(NotImplementedError):
        blosc_decompress(chunk)  # blosclz


def test_load_masks_reads_reference_layout_store(tmp_path):
    """_load_masks: reference path object/<split>/<base>/mask_2/<id>.zarr wins
    over the pickle fallback, values binarized (!= 0)."""
    from disprcnn_tpu.data.datasets.kitti import KittiStereoDataset

    ds = KittiStereoDataset.__new__(KittiStereoDataset)
    ds.root = str(tmp_path)
    ds.split_dir = "training"
    ds.shape_prior_base = "vob"
    masks = np.zeros((2, 8, 10), "|u1")
    masks[0, 2:5, 3:7] = 1
    masks[1, 0:3, 0:4] = 2
    store = tmp_path / "object" / "training" / "vob" / "mask_2" / "000042.zarr"
    _write_store(str(store), _meta(masks.shape, masks.shape, "|u1", None),
                 {"0.0.0": masks.tobytes()})
    got = ds._load_masks("000042", 2, (8, 10))
    np.testing.assert_array_equal(got, (masks != 0).astype(np.float32))
