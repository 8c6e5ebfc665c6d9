"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with typed metadata structs.
The Spark-side machinery here is real and tested — schema, Arrow batch shape,
mapInArrow signature, partitioning — while the actual media *decode* step is
a deterministic stub (`_fake_decode`): the container ships no image/audio
libraries (SURVEY.md environment note), so the stub derives stable pseudo
dimensions from the payload bytes. Swapping `_fake_decode` for a real
PIL/ffmpeg call changes nothing upstream or downstream.

Null payloads PROPAGATE (ADVICE r3): a null is not an empty payload — the
metadata and resize rows carry null stats/thumbs for null inputs (Arrow
validity bitmap honored on both sides), and the frame sampler emits zero
frames for them (an exploding shape has no row to null out).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

METADATA_SCHEMA = (
    "doc_id long, n_bytes long, first_byte int, checksum long, "
    "fake_width int, fake_height int"
)


def _fake_decode(n_bytes: np.ndarray, first_byte: np.ndarray,
                 checksum: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic stand-in for a media decoder: pseudo width/height from
    payload stats. Replace with a real decoder (PIL.Image.open etc.) when
    the libraries exist; NotImplementedError is deliberately NOT raised so
    the pipeline stays runnable end-to-end."""
    width = (n_bytes % 64 + 16).astype(np.int32)
    height = ((checksum % 48) + 16).astype(np.int32)
    return width, height


def _null_mask(payload: pa.Array) -> np.ndarray | None:
    """Boolean numpy mask (True = null) from the validity bitmap, or None
    when the batch has no nulls — Arrow gives null slots zero-length spans,
    so without this mask a null payload is silently read as empty."""
    if payload.null_count == 0:
        return None
    return payload.is_null().to_numpy(zero_copy_only=False)


def extract_binary_metadata(df: DataFrame, *, payload_col: str = "payload",
                            id_col: str = "doc_id") -> DataFrame:
    """binary payload -> typed metadata row, vectorized over Arrow batches.

    Zero-copy reads of the Arrow binary buffers: lengths come from offsets,
    first bytes and checksums from the flat value buffer — no per-row Python.
    """

    def meta(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            names = batch.schema.names
            payload = batch.column(names.index(payload_col))
            if isinstance(payload, pa.ChunkedArray):
                payload = payload.combine_chunks()
            # BinaryArray layout: buffers = [validity, int32 offsets, data]
            bufs = payload.buffers()
            all_offsets = np.frombuffer(bufs[1], dtype=np.int32)
            offsets = all_offsets[payload.offset: payload.offset
                                  + len(payload) + 1].astype(np.int64)
            values = (np.frombuffer(bufs[2], dtype=np.uint8)
                      if bufs[2] is not None else np.zeros(0, np.uint8))
            lens = np.diff(offsets)
            if len(values) == 0:
                first = np.zeros(len(lens), dtype=np.int32)
                csum = np.zeros(len(lens), dtype=np.int64)
            else:
                first = np.where(
                    lens > 0,
                    values[np.minimum(offsets[:-1], len(values) - 1)],
                    0,
                ).astype(np.int32)
                # vectorized additive checksum per row: prefix-sum difference
                # with an explicit end bound (offsets[i+1]), exact for empty
                # rows AND for sliced arrays / padded buffers — reduceat's
                # last segment would run to the end of the data buffer
                cs = np.concatenate(
                    ([0], np.cumsum(values, dtype=np.int64)))
                csum = cs[offsets[1:]] - cs[offsets[:-1]]
            width, height = _fake_decode(lens, first, csum)
            ids = batch.column(names.index(id_col))
            nulls = _null_mask(payload)
            yield pa.RecordBatch.from_arrays(
                [
                    ids.cast(pa.int64()),
                    pa.array(lens, mask=nulls),
                    pa.array(first, mask=nulls),
                    pa.array(csum, mask=nulls),
                    pa.array(width, mask=nulls),
                    pa.array(height, mask=nulls),
                ],
                names=["doc_id", "n_bytes", "first_byte", "checksum",
                       "fake_width", "fake_height"],
            )

    return df.mapInArrow(meta, schema=METADATA_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_off long, frame_checksum long"


def sample_frames(df: DataFrame, *, frame_bytes: int = 32, stride: int = 4,
                  payload_col: str = "payload",
                  id_col: str = "doc_id") -> DataFrame:
    """Frame sampling over video-like binary payloads: the EXPLODING
    (1 -> N rows) Arrow shape a real frame sampler has.

    The payload is treated as ``n_bytes // frame_bytes`` fixed-size frames;
    every ``stride``-th frame is emitted with its byte offset and an
    additive checksum of its bytes (the deterministic stand-in for the
    per-frame decode — swapping the checksum for an ffmpeg/PIL call changes
    nothing in the batch plumbing). Fully vectorized: sampled-frame counts
    via integer arithmetic, per-frame spans via one prefix-sum over the
    flat value buffer, row replication with np.repeat — no per-row Python.
    """

    def frames(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            names = batch.schema.names
            payload = batch.column(names.index(payload_col))
            if isinstance(payload, pa.ChunkedArray):
                payload = payload.combine_chunks()
            bufs = payload.buffers()
            all_offsets = np.frombuffer(bufs[1], dtype=np.int32)
            offsets = all_offsets[payload.offset: payload.offset
                                  + len(payload) + 1].astype(np.int64)
            values = (np.frombuffer(bufs[2], dtype=np.uint8)
                      if bufs[2] is not None else np.zeros(0, np.uint8))
            lens = np.diff(offsets)
            n_frames = lens // frame_bytes
            nulls = _null_mask(payload)
            if nulls is not None:
                n_frames = np.where(nulls, 0, n_frames)  # null -> no frames
            n_sampled = (n_frames + stride - 1) // stride
            total = int(n_sampled.sum())
            if total == 0:
                continue
            row_idx = np.repeat(np.arange(batch.num_rows), n_sampled)
            ends = np.cumsum(n_sampled)
            within = np.arange(total) - np.repeat(ends - n_sampled, n_sampled)
            frame_idx = (within * stride).astype(np.int32)
            frame_off = frame_idx.astype(np.int64) * frame_bytes
            starts = offsets[:-1][row_idx] + frame_off
            cs = np.concatenate(([0], np.cumsum(values, dtype=np.int64)))
            checksum = cs[starts + frame_bytes] - cs[starts]
            ids = batch.column(names.index(id_col)).take(pa.array(row_idx))
            yield pa.RecordBatch.from_arrays(
                [ids.cast(pa.int64()), pa.array(frame_idx),
                 pa.array(frame_off), pa.array(checksum)],
                names=["doc_id", "frame_idx", "frame_off", "frame_checksum"],
            )

    return df.mapInArrow(frames, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = ("doc_id long, n_bytes_in long, n_bytes_out long, "
                 "thumb binary, thumb_checksum long")


def resize_payload(df: DataFrame, *, factor: int = 8,
                   payload_col: str = "payload",
                   id_col: str = "doc_id") -> DataFrame:
    """Resize/downsample plumbing: binary in -> smaller binary out.

    Deterministic stand-in for an image resize: keep every ``factor``-th
    byte (nearest-neighbor decimation on the raw payload), emit the thumb
    as a REAL binary column plus its size and checksum — the
    binary-to-binary Arrow shape (variable-size output buffers rebuilt
    per batch) that a PIL/ffmpeg thumbnailer has. Vectorized: one boolean
    stride mask over the flat value buffer, output offsets by prefix sum;
    no per-row Python.
    """

    def resize(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            names = batch.schema.names
            payload = batch.column(names.index(payload_col))
            if isinstance(payload, pa.ChunkedArray):
                payload = payload.combine_chunks()
            bufs = payload.buffers()
            all_offsets = np.frombuffer(bufs[1], dtype=np.int32)
            offsets = all_offsets[payload.offset: payload.offset
                                  + len(payload) + 1].astype(np.int64)
            values = (np.frombuffer(bufs[2], dtype=np.uint8)
                      if bufs[2] is not None else np.zeros(0, np.uint8))
            lens = np.diff(offsets)
            # positions kept: bytes whose offset WITHIN the row is a
            # multiple of factor
            pos = np.arange(offsets[0], offsets[-1])
            within = pos - np.repeat(offsets[:-1], lens)
            keep = (within % factor) == 0
            sliced = values[offsets[0]:offsets[-1]]
            thumb_vals = sliced[keep]
            out_lens = (lens + factor - 1) // factor
            nulls = _null_mask(payload)
            out_offsets = np.concatenate(
                ([0], np.cumsum(out_lens))).astype(np.int32)
            validity = (None if nulls is None else pa.py_buffer(
                np.packbits(~nulls, bitorder="little").tobytes()))
            thumb = pa.BinaryArray.from_buffers(
                pa.binary(), len(lens),
                [validity, pa.py_buffer(out_offsets.tobytes()),
                 pa.py_buffer(thumb_vals.tobytes())],
                null_count=0 if nulls is None else int(nulls.sum()))
            cs = np.concatenate(
                ([0], np.cumsum(thumb_vals, dtype=np.int64)))
            checksum = cs[out_offsets[1:]] - cs[out_offsets[:-1]]
            ids = batch.column(names.index(id_col))
            yield pa.RecordBatch.from_arrays(
                [ids.cast(pa.int64()), pa.array(lens, mask=nulls),
                 pa.array(out_lens.astype(np.int64), mask=nulls), thumb,
                 pa.array(checksum, mask=nulls)],
                names=["doc_id", "n_bytes_in", "n_bytes_out", "thumb",
                       "thumb_checksum"],
            )

    return df.mapInArrow(resize, schema=RESIZE_SCHEMA)
