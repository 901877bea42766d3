"""Multimodal (image / audio / video) stages for training-data pipelines.

The reference has no media handling (its readers are csv/parquet/netcdf —
/root/reference/tsdat/io/readers/); these are the engine-native operators a
multimodal training corpus needs, built on the same actor-pool
``map_batches(Cls, batch_format="pyarrow")`` pattern as every stateful stage.

Data model: media is an opaque ``payload: binary`` column plus typed metadata
columns (``kind``, ``width``, ``height``, ``channels``, ``sample_rate``,
``n_frames``, ``codec``).  The Ray-side plumbing (schema, batch sizing, actor
signatures, zero-copy binary handling, output layout) is fully real and
tested.  REAL pure-python codecs: raw, png (all 5 filters, lossless), jpeg
(baseline DCT decode), every uncompressed WAV variant (8/16/24/32-bit int +
IEEE float), G.711 mu-law/A-law and IMA ADPCM compressed audio (r4), and —
r5 — MJPEG video (frame-sequence of real baseline JPEGs, split on JPEG
structure; sampling decodes only the frames it keeps).
Only opus/h264 remain stubbed behind a clearly-marked
``NotImplementedError`` (no soundfile/av in this container — swap
``_decode_compressed`` for them in production).

Batch-size note (SURVEY.md §4): media payloads are large; callers should pass
``batch_size`` small (e.g. 32–256 rows) so batch × concurrency stays well
under the worker heap, and let the object store spill the rest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("codec", pa.string()),       # raw|jpeg|png|pcm16|wav|mjpeg|opus|h264
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("sample_rate", pa.int32()),  # audio only
        ("n_frames", pa.int32()),     # video only
    ]
)


def _decode_compressed(codec: str, payload: bytes) -> np.ndarray:
    """Compressed-codec decode.  ``png`` is REAL (pure-python zlib+numpy
    codec, lossless — stages/png_codec.py); jpeg/opus/h264 remain stubbed
    because the container has no image/audio libraries (PIL/soundfile/av) —
    production swaps those in.  The surrounding plumbing (actor pools,
    schema, batching) is real for every codec."""
    if codec == "png":
        from .png_codec import png_decode

        return png_decode(payload).reshape(-1)
    if codec == "jpeg":
        from .jpeg_codec import jpeg_decode

        return jpeg_decode(payload).reshape(-1)
    if codec == "wav":
        return _wav_decode(payload)
    raise NotImplementedError(
        f"codec {codec!r}: compressed media decode requires an audio/video "
        "library not present in this environment (soundfile / av). "
        "Use codec='raw'/'pcm16'/'png'/'jpeg' payloads, or install a decoder."
    )


def _wav_decode(payload: bytes) -> np.ndarray:
    """RIFF/WAVE decode covering every uncompressed container variant (r4;
    stdlib ``wave`` rejects IEEE float, so this is a direct chunk parser):
    integer PCM at 8 (unsigned), 16, 24 (sign-extended and left-shifted to
    full int32 range) and 32 bits, and IEEE float at 32/64 bits, including
    WAVE_FORMAT_EXTENSIBLE headers.  Returns the samples in their native
    dtype (uint8 / int16 / int32 / float32 / float64), interleaved across
    channels; :class:`AudioFeatures` normalizes by dtype."""
    b = payload
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("wav: not a RIFF/WAVE payload")
    pos, fmt, data, fact_n = 12, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        sz = int.from_bytes(b[pos + 4:pos + 8], "little")
        body = b[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and sz >= 4:
            # dwSampleLength: the TRUE per-channel sample count — required
            # for block codecs (ADPCM) whose final block is nibble-padded
            fact_n = int.from_bytes(body[0:4], "little")
        pos += 8 + sz + (sz & 1)  # chunks are 16-bit word aligned
    if fmt is None or data is None:
        raise ValueError("wav: missing fmt/data chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt == 0xFFFE and len(fmt) >= 26:  # EXTENSIBLE: real fmt in GUID
        audio_fmt = int.from_bytes(fmt[24:26], "little")
    if audio_fmt == 1:  # integer PCM
        if bits == 8:
            return np.frombuffer(data, np.uint8)
        if bits == 16:
            return np.frombuffer(data, "<i2")
        if bits == 24:
            raw = np.frombuffer(data, np.uint8)
            raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3)
            # little-endian 24-bit → int32 with the value in the TOP 3
            # bytes (full int32 range, the standard promotion)
            out = np.zeros(len(raw), "<u4")
            out |= raw[:, 0].astype("<u4") << 8
            out |= raw[:, 1].astype("<u4") << 16
            out |= raw[:, 2].astype("<u4") << 24
            return out.view("<i4")
        if bits == 32:
            return np.frombuffer(data, "<i4")
        raise NotImplementedError(f"wav: {bits}-bit integer PCM")
    if audio_fmt == 3:  # IEEE float
        if bits == 32:
            return np.frombuffer(data, "<f4")
        if bits == 64:
            return np.frombuffer(data, "<f8")
        raise NotImplementedError(f"wav: {bits}-bit float PCM")
    if audio_fmt == 6:  # G.711 A-law (r4: real pure-numpy decode)
        return alaw_decode(np.frombuffer(data, np.uint8))
    if audio_fmt == 7:  # G.711 mu-law
        return mulaw_decode(np.frombuffer(data, np.uint8))
    if audio_fmt == 0x11:  # IMA ADPCM
        block_align = int.from_bytes(fmt[12:14], "little") or 256
        return ima_adpcm_decode(data, block_align, n_samples=fact_n)
    raise NotImplementedError(f"wav: audio format {audio_fmt} (compressed)")


def _norm_audio(x: np.ndarray) -> np.ndarray:
    """Normalize decoded samples to float64 in [-1, 1) by native dtype."""
    if x.dtype == np.uint8:  # 8-bit WAV PCM is unsigned, offset-128
        return (x.astype(np.float64) - 128.0) / 128.0
    if x.dtype == np.int16:
        return x.astype(np.float64) / 32768.0
    if x.dtype == np.int32:
        return x.astype(np.float64) / 2147483648.0
    return x.astype(np.float64)


def synth_media_table(n: int = 64, seed: int = 123) -> pa.Table:
    """Deterministic fake media corpus: raw RGB images, pcm16 audio clips and
    raw frame-stacked videos (seeded; used by tests and the media queries)."""
    rng = np.random.Generator(np.random.Philox(key=np.array([seed, 2], dtype=np.uint64)))
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    prev_img = prev_vid = None  # planted near-dups for the dHash queries
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            if (i // 3) % 4 == 3 and prev_img is not None:
                # every 4th image: lightly-noised copy of the previous one
                # (a perceptual near-duplicate the dHash pairs must find)
                pw, ph, ppx = prev_img
                w, h, c = pw, ph, 3
                px = np.clip(ppx.astype(np.int64)
                             + rng.integers(-2, 3, ppx.shape),
                             0, 255).astype(np.uint8)
            else:
                w, h, c = int(rng.integers(8, 24)), int(rng.integers(8, 24)), 3
                px = rng.integers(0, 256, w * h * c, dtype=np.uint8)
            prev_img = (w, h, px)
            # kind cycles on i%3, so images are i=0,3,6,…; cycle the image
            # codec on the IMAGE ordinal (i//3) — a third png, jpeg, raw
            if (i // 3) % 3 == 0:
                from .png_codec import png_encode

                payload = png_encode(px.reshape(h, w, c))
                codec = "png"
            elif (i // 3) % 3 == 1:  # lossy: stats reflect the decode
                from .jpeg_codec import jpeg_encode

                payload = jpeg_encode(px.reshape(h, w, c), quality=90)
                codec = "jpeg"
            else:
                payload = px.tobytes()
                codec = "raw"
            meta = dict(width=w, height=h, channels=c, sample_rate=0, n_frames=0, codec=codec)
        elif kind == "audio":
            sr, nsamp = 16000, int(rng.integers(256, 2048))
            pcm = rng.integers(-32768, 32767, nsamp, dtype=np.int16)
            # audio ordinal (i//3) alternates raw pcm16 and WAV container
            if (i // 3) % 2 == 1:
                import io
                import wave

                bio = io.BytesIO()
                with wave.open(bio, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sr)
                    w.writeframes(pcm.tobytes())
                payload, codec = bio.getvalue(), "wav"
            else:
                payload, codec = pcm.tobytes(), "pcm16"
            meta = dict(width=0, height=0, channels=1, sample_rate=sr, n_frames=0, codec=codec)
        else:
            w, h, c = 8, 8, 3
            if (i // 3) % 4 == 3 and prev_vid is not None:
                f, frames = prev_vid
                frames = np.clip(frames.astype(np.int64)
                                 + rng.integers(-2, 3, frames.shape),
                                 0, 255).astype(np.uint8)
            else:
                f = int(rng.integers(4, 12))
                frames = rng.integers(0, 256, w * h * c * f, dtype=np.uint8)
            prev_vid = (f, frames)
            # video ordinal cycles raw / MJPEG in blocks of 4 so each
            # planted near-dup PAIR (ordinals 4k+2, 4k+3) shares a codec;
            # mjpeg clips round-trip the real baseline-JPEG codec (r5)
            if (i // 3) % 8 >= 4:
                from .jpeg_codec import mjpeg_encode

                payload = mjpeg_encode(frames.reshape(f, h, w, c),
                                       quality=90)
                codec = "mjpeg"
            else:
                payload = frames.tobytes()
                codec = "raw"
            meta = dict(width=w, height=h, channels=c, sample_rate=0, n_frames=f, codec=codec)
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        for k, v in meta.items():
            rows[k].append(v)
    return pa.table(
        {name: pa.array(rows[name], type=MEDIA_SCHEMA.field(name).type) for name in MEDIA_SCHEMA.names}
    )


class ImageDecode:
    """Actor-pool stage: payload binary → per-image pixel stats + normalized
    small feature vector.  Raw payloads decode with numpy (zero-copy
    frombuffer); compressed codecs hit the stub."""

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id",
                 feature_bins: int = 16):
        self.payload_col = payload_col
        self.id_col = id_col
        self.bins = feature_bins
        self.edges = np.linspace(0, 256, feature_bins + 1)

    def decode_one(self, codec: str, payload: bytes, w: int, h: int, c: int) -> np.ndarray:
        if codec == "raw":
            return np.frombuffer(payload, dtype=np.uint8).reshape(h * w * c)
        return _decode_compressed(codec, payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, means, stds, hists = [], [], [], []
        pay = batch[self.payload_col].combine_chunks()
        codecs = batch["codec"].to_pylist()
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        cs = batch["channels"].to_pylist()
        for i in range(batch.num_rows):
            px = self.decode_one(codecs[i], pay[i].as_py(), ws[i], hs[i], cs[i])
            hist, _ = np.histogram(px, bins=self.edges)
            ids.append(batch[self.id_col][i].as_py())
            means.append(float(px.mean()))
            stds.append(float(px.std()))
            hists.append((hist / max(1, px.size)).astype(np.float32))
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "px_mean": pa.array(means, pa.float64()),
                "px_std": pa.array(stds, pa.float64()),
                "hist": pa.array([h.tolist() for h in hists], pa.list_(pa.float32())),
            }
        )


class ImageResize:
    """Actor-pool stage: nearest-neighbor resize of raw images to a fixed
    (out_w, out_h) — pure numpy index math, emits raw payloads again."""

    def __init__(self, out_w: int = 8, out_h: int = 8,
                 payload_col: str = "payload", id_col: str = "media_id"):
        self.out_w, self.out_h = out_w, out_h
        self.payload_col = payload_col
        self.id_col = id_col

    def resize_one(self, codec: str, payload: bytes, w: int, h: int, c: int) -> bytes:
        if codec == "raw":
            px = np.frombuffer(payload, dtype=np.uint8)
        else:
            px = _decode_compressed(codec, payload)
        img = px.reshape(h, w, c)
        yi = (np.arange(self.out_h) * h // self.out_h)
        xi = (np.arange(self.out_w) * w // self.out_w)
        return img[np.ix_(yi, xi)].tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        pay = batch[self.payload_col].combine_chunks()
        out = []
        for i in range(batch.num_rows):
            out.append(
                self.resize_one(
                    batch["codec"][i].as_py(),
                    pay[i].as_py(),
                    batch["width"][i].as_py(),
                    batch["height"][i].as_py(),
                    batch["channels"][i].as_py(),
                )
            )
        n = batch.num_rows
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "payload": pa.array(out, pa.binary()),
                "width": pa.array([self.out_w] * n, pa.int32()),
                "height": pa.array([self.out_h] * n, pa.int32()),
                "channels": batch["channels"],
                "codec": pa.array(["raw"] * n, pa.string()),
            }
        )


class AudioFeatures:
    """Actor-pool stage: pcm16 payload → per-window RMS energy features +
    clip-level stats (duration, peak, rms)."""

    def __init__(self, frame: int = 256, payload_col: str = "payload", id_col: str = "media_id"):
        self.frame = frame
        self.payload_col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        pay = batch[self.payload_col].combine_chunks()
        ids, durs, peaks, rmss, frames = [], [], [], [], []
        for i in range(batch.num_rows):
            codec = batch["codec"][i].as_py()
            if codec == "pcm16":
                samples = np.frombuffer(pay[i].as_py(), dtype=np.int16)
            else:
                samples = _decode_compressed(codec, pay[i].as_py())
            x = _norm_audio(samples)
            sr = max(1, batch["sample_rate"][i].as_py())
            nf = len(x) // self.frame
            fr = x[: nf * self.frame].reshape(nf, self.frame) if nf else x.reshape(0, 0)
            frame_rms = np.sqrt((fr**2).mean(axis=1)) if nf else np.zeros(0)
            ids.append(batch[self.id_col][i].as_py())
            durs.append(len(x) / sr)
            peaks.append(float(np.abs(x).max()) if len(x) else 0.0)
            rmss.append(float(np.sqrt((x**2).mean())) if len(x) else 0.0)
            frames.append(frame_rms.astype(np.float32).tolist())
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "duration_s": pa.array(durs, pa.float64()),
                "peak": pa.array(peaks, pa.float64()),
                "rms": pa.array(rmss, pa.float64()),
                "frame_rms": pa.array(frames, pa.list_(pa.float32())),
            }
        )


def _video_frames(codec: str, payload: bytes, w: int, h: int, c: int,
                  nf: int, every: int):
    """Yield ``(frame_idx, raw_frame_bytes)`` for every ``every``-th frame.

    ``raw``: zero-copy reshape of the stacked payload.  ``mjpeg`` (r5): the
    payload is split on JPEG frame structure (cheap segment walk) and ONLY
    the selected frames run the real baseline-JPEG decode — sampling cost
    scales with frames kept, not frames stored.  Other codecs (h264/…)
    raise the documented env-constrained stub."""
    if codec == "raw":
        raw = np.frombuffer(payload, dtype=np.uint8).reshape(nf, h * w * c)
        for j in range(0, nf, every):
            yield j, raw[j].tobytes()
    elif codec == "mjpeg":
        from .jpeg_codec import jpeg_decode, mjpeg_split

        frames = mjpeg_split(payload)
        if len(frames) != nf:
            raise ValueError(
                f"mjpeg: payload holds {len(frames)} frames, meta says {nf}")
        for j in range(0, nf, every):
            img = jpeg_decode(frames[j])
            if img.shape[2] == 1 and c == 3:  # grayscale JPEG of RGB meta
                img = np.repeat(img, 3, axis=2)
            yield j, np.ascontiguousarray(img).tobytes()
    else:
        _decode_compressed(codec, b"")


class VideoFrameSample:
    """Actor-pool stage: frame-stacked video payload (``raw`` or ``mjpeg``)
    → every k-th frame as one output row (flat_map-style row expansion
    inside map_batches); mjpeg frames emerge DECODED (raw pixels)."""

    def __init__(self, every: int = 2, payload_col: str = "payload", id_col: str = "media_id"):
        self.every = every
        self.payload_col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        pay = batch[self.payload_col].combine_chunks()
        ids, fidx, payloads, ws, hs, cs = [], [], [], [], [], []
        for i in range(batch.num_rows):
            w = batch["width"][i].as_py()
            h = batch["height"][i].as_py()
            c = batch["channels"][i].as_py()
            nf = batch["n_frames"][i].as_py()
            for j, fr in _video_frames(batch["codec"][i].as_py(),
                                       pay[i].as_py(), w, h, c, nf,
                                       self.every):
                ids.append(batch[self.id_col][i].as_py())
                fidx.append(j)
                payloads.append(fr)
                ws.append(w)
                hs.append(h)
                cs.append(c)
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "channels": pa.array(cs, pa.int32()),
            }
        )


# ---- real compressed-audio codecs, pure numpy (r4) -------------------------
# G.711 mu-law / A-law (8 kbit/sample logarithmic PCM, RFC 3551 / ITU G.711)
# and IMA ADPCM (4-bit adaptive differential PCM, the WAV fmt 0x11 codec).
# These close the "compressed audio" gap for the three classic telephony /
# container codecs that need no external library; opus/h264 stay stubbed.

def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """G.711 mu-law bytes → int16 PCM (vectorized table formula)."""
    u = (~codes.astype(np.uint8)).astype(np.int64)
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    val = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -val, val).astype(np.int16)


def mulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 PCM → G.711 mu-law bytes (vectorized; BIAS=0x84, CLIP=32635)."""
    x = pcm.astype(np.int64)
    sign = np.where(x < 0, 0x80, 0)
    x = np.minimum(np.abs(x), 32635) + 0x84
    exp = (np.floor(np.log2(x)) - 7).astype(np.int64)
    mant = (x >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant)).astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """G.711 A-law bytes → int16 PCM (vectorized)."""
    a = codes.astype(np.int64) ^ 0x55
    sign = a & 0x80  # bit 7 SET means positive in A-law
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    val = np.where(exp == 0, (mant << 4) + 8,
                   ((mant << 4) + 0x108) << (exp - 1))
    return np.where(sign, val, -val).astype(np.int16)


def alaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 PCM → G.711 A-law bytes (vectorized)."""
    x = pcm.astype(np.int64)
    sign = np.where(x >= 0, 0x80, 0)
    x = np.minimum(np.abs(x), 32767)
    exp = np.maximum((np.floor(np.log2(np.maximum(x, 1))) - 7)
                     .astype(np.int64), 0)
    mant = np.where(exp == 0, x >> 4, (x >> (exp + 3)) & 0x0F)
    return ((sign | (exp << 4) | mant) ^ 0x55).astype(np.uint8)


_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], np.int64)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int64)


def ima_adpcm_decode(payload: bytes, block_align: int = 256,
                     n_samples: int | None = None) -> np.ndarray:
    """IMA ADPCM (WAV fmt 0x11, mono) → int16 PCM.  Block layout: int16
    predictor, uint8 step index, 1 reserved byte, then 4-bit nibbles
    (low nibble first).  The adaptive recurrence is inherently sequential;
    per-block state resets keep error bounded and let blocks decode
    independently (parallel across blocks at scale).

    ``n_samples``: the TRUE sample count (a WAV ``fact`` chunk's
    dwSampleLength — :func:`_wav_decode` passes it through).  The final
    partial block is nibble-padded by every encoder, so without it the
    decode carries trailing synthetic samples (advisor r4); with it the
    output is truncated to exactly the original length."""
    out = []
    b = payload
    for off in range(0, len(b) - 3, block_align):
        blk = b[off:off + block_align]
        pred = int.from_bytes(blk[0:2], "little", signed=True)
        idx = min(max(blk[2], 0), 88)
        out.append(pred)
        nib = np.frombuffer(blk[4:], np.uint8)
        nibbles = np.empty(len(nib) * 2, np.uint8)
        nibbles[0::2] = nib & 0x0F
        nibbles[1::2] = nib >> 4
        for n in nibbles:
            step = int(_IMA_STEPS[idx])
            diff = step >> 3
            if n & 1:
                diff += step >> 2
            if n & 2:
                diff += step >> 1
            if n & 4:
                diff += step
            pred = pred - diff if (n & 8) else pred + diff
            pred = min(max(pred, -32768), 32767)
            idx = min(max(idx + int(_IMA_INDEX[n & 7]), 0), 88)
            out.append(pred)
    arr = np.asarray(out, np.int16)
    return arr[:n_samples] if n_samples is not None else arr


def ima_adpcm_encode(pcm: np.ndarray, block_align: int = 256) -> bytes:
    """int16 PCM → IMA ADPCM mono blocks (the encoder half, for round-trip
    tests and synthetic corpora)."""
    x = pcm.astype(np.int64)
    samples_per_block = (block_align - 4) * 2 + 1
    chunks = []
    pos = 0
    idx = 0
    while pos < len(x):
        seg = x[pos:pos + samples_per_block]
        pred = int(seg[0])
        hdr = int(pred).to_bytes(2, "little", signed=True) \
            + bytes([idx, 0])
        nibbles = []
        for s in seg[1:]:
            step = int(_IMA_STEPS[idx])
            delta = int(s) - pred
            n = 8 if delta < 0 else 0
            delta = abs(delta)
            if delta >= step:
                n |= 4
                delta -= step
            if delta >= step >> 1:
                n |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                n |= 1
            diff = step >> 3
            if n & 1:
                diff += step >> 2
            if n & 2:
                diff += step >> 1
            if n & 4:
                diff += step
            pred = pred - diff if (n & 8) else pred + diff
            pred = min(max(pred, -32768), 32767)
            idx = min(max(idx + int(_IMA_INDEX[n & 7]), 0), 88)
            nibbles.append(n)
        if len(nibbles) % 2:
            nibbles.append(0)
        arr = np.asarray(nibbles, np.uint8)
        packed = (arr[0::2] | (arr[1::2] << 4)).astype(np.uint8).tobytes()
        packed = packed.ljust(block_align - 4, b"\x00")
        chunks.append(hdr + packed)
        pos += samples_per_block
    return b"".join(chunks)


class ImageDHash:
    """Actor-pool stage: perceptual difference-hash (dHash) per image — the
    standard near-duplicate image fingerprint (resize to (hash_w+1) x
    hash_h grayscale by nearest-neighbor index math, hash bit = left pixel
    brighter than its right neighbor).  64-bit output composes with the
    SimHash rotated-prefix hamming bucketing (stages/dedup.py) for
    corpus-scale image dedup; robust to re-encoding (png vs raw vs
    mild-quality jpeg of the same pixels hash near-identically)."""

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id",
                 hash_w: int = 8, hash_h: int = 8):
        self.payload_col = payload_col
        self.id_col = id_col
        self.hw = hash_w
        self.hh = hash_h

    def _one(self, codec: str, payload: bytes, w: int, h: int,
             c: int) -> int:
        if codec == "raw":
            px = np.frombuffer(payload, np.uint8)
        else:
            px = _decode_compressed(codec, payload)
        px = px.reshape(h, w, c).astype(np.float64)
        gray = px.mean(axis=2)
        yi = (np.arange(self.hh) * h) // self.hh
        xi = (np.arange(self.hw + 1) * w) // (self.hw + 1)
        small = gray[np.ix_(yi, xi)]
        bits = (small[:, :-1] > small[:, 1:]).reshape(-1)
        return int(np.packbits(bits.astype(np.uint8)).view(">u8")[0]) \
            if self.hw * self.hh == 64 else int(
                sum(int(b) << i for i, b in enumerate(bits)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        pay = batch[self.payload_col].combine_chunks()
        codecs = batch["codec"].to_pylist()
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        cs = batch["channels"].to_pylist()
        out = np.zeros(batch.num_rows, np.uint64)
        for i in range(batch.num_rows):
            out[i] = self._one(codecs[i], pay[i].as_py(), ws[i], hs[i],
                               cs[i])
        return pa.table({
            self.id_col: batch[self.id_col],
            "dhash": pa.array(out),
        })


class AudioFingerprint:
    """Actor-pool stage: spectral-peak fingerprint per clip (the
    Shazam/chromaprint shape): frame the normalized signal, rfft each
    frame (one vectorized 2-D FFT per clip), take the argmax frequency bin
    per frame, and pack the peak-bin SEQUENCE into one 64-bit rolling
    hash.  Identical audio → identical fingerprint; use exact dedup on
    (fingerprint, id) for corpus-scale duplicate-clip removal."""

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id",
                 frame: int = 256):
        self.payload_col = payload_col
        self.id_col = id_col
        self.frame = frame

    def _one(self, codec: str, payload: bytes) -> tuple[int, int]:
        if codec == "pcm16":
            samples = np.frombuffer(payload, np.int16)
        else:
            samples = _decode_compressed(codec, payload)
        x = _norm_audio(samples)
        nf = len(x) // self.frame
        if nf == 0:
            return 0, 0
        spec = np.abs(np.fft.rfft(x[: nf * self.frame]
                                  .reshape(nf, self.frame), axis=1))
        peaks = spec[:, 1:].argmax(axis=1).astype(np.uint64)  # skip DC
        h = np.uint64(0xCBF29CE484222325)
        with np.errstate(over="ignore"):  # uint64 wraparound is the hash
            for p in peaks:
                h = h * np.uint64(0x100000001B3) + p + np.uint64(1)
        return int(h), nf

    def __call__(self, batch: pa.Table) -> pa.Table:
        pay = batch[self.payload_col].combine_chunks()
        codecs = batch["codec"].to_pylist()
        fps = np.zeros(batch.num_rows, np.uint64)
        nfs = np.zeros(batch.num_rows, np.int64)
        for i in range(batch.num_rows):
            fps[i], nfs[i] = self._one(codecs[i], pay[i].as_py())
        return pa.table({
            self.id_col: batch[self.id_col],
            "fingerprint": pa.array(fps),
            "n_frames_fp": pa.array(nfs),
        })


class VideoDHash:
    """Actor-pool stage: 64-bit perceptual VIDEO signature = bitwise
    MAJORITY vote over the per-frame dHashes of every ``every``-th frame.
    Majority voting keeps the signature hamming-meaningful (each output
    bit flips only when most frames' corresponding gradient flips), so two
    re-encoded / lightly-noised cuts of the same footage land within a few
    bits and :func:`tsdat_ray.stages.dedup.signature_neardup_pairs` finds
    them with the same rotated-prefix bucketing as text/image near-dup —
    no all-pairs at any corpus size."""

    def __init__(self, every: int = 2, payload_col: str = "payload",
                 id_col: str = "media_id"):
        self.every = every
        self.payload_col = payload_col
        self.id_col = id_col
        self._dh = ImageDHash()

    def _one(self, codec: str, payload: bytes, w: int, h: int, c: int,
             nf: int) -> int:
        rows = []
        for _j, fr in _video_frames(codec, payload, w, h, c, nf, self.every):
            hv = self._dh._one("raw", fr, w, h, c)
            rows.append((np.uint64(hv) >> np.arange(64, dtype=np.uint64))
                        & np.uint64(1))
        bits = np.stack(rows) if rows else np.zeros((0, 64), np.uint64)
        maj = (bits.sum(axis=0) * 2 > bits.shape[0]).astype(np.uint64)
        return int((maj << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        pay = batch[self.payload_col].combine_chunks()
        out = np.zeros(batch.num_rows, np.uint64)
        for i in range(batch.num_rows):
            out[i] = self._one(
                batch["codec"][i].as_py(), pay[i].as_py(),
                batch["width"][i].as_py(), batch["height"][i].as_py(),
                batch["channels"][i].as_py(), batch["n_frames"][i].as_py())
        return pa.table({
            self.id_col: batch[self.id_col],
            "vdhash": pa.array(out),
        })
