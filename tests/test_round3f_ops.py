"""Unit tests for the round-3 (continuation 7) corpus-statistics family:
per-doc word entropy, per-sequence token entropy, Zipf slope, distinctive
terms (lift), and per-source unigram KL divergence."""

import math

import numpy as np
import pyarrow as pa


def _ent_ref(words, scale=1e9):
    """Sequential reference: quantized-term entropy, half-away rounding."""
    from collections import Counter

    n = len(words)
    if n == 0:
        return 0, 0.0
    q = 0
    for c in Counter(words).values():
        p = c / n
        term = -(p * math.log(p)) * scale
        q += int(math.floor(abs(term) + 0.5) * (1 if term >= 0 else -1))
    return n, q / scale


def test_word_entropy_matches_reference(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.text import word_entropy

    texts = ["a a a a", "a b c d", "x x y", "", "solo",
             "the the quick quick quick brown"]
    tab = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    got = (word_entropy(rd.from_arrow(tab)).to_pandas()
           .set_index("doc_id").sort_index())
    for i, t in enumerate(texts):
        n, e = _ent_ref([w for w in t.split(" ") if w])
        assert got.loc[i, "n_words"] == n
        assert got.loc[i, "entropy"] == e
    # uniform distribution = max entropy ln(k)
    assert abs(got.loc[1, "entropy"] - math.log(4)) < 1e-6
    assert got.loc[0, "entropy"] == 0.0


def test_token_entropy_matches_reference(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.sampling import token_entropy

    toks = [[1, 1, 1], [1, 2, 3, 4], [7], [5, 5, 6, 6, 6]]
    tab = pa.table({
        "doc_id": pa.array(range(len(toks)), pa.int64()),
        "tokens": pa.array(toks, pa.list_(pa.int32())),
    })
    got = (token_entropy(rd.from_arrow(tab)).to_pandas()
           .set_index("doc_id").sort_index())
    for i, tk in enumerate(toks):
        n, e = _ent_ref(tk)
        assert got.loc[i, "n_tok_actual"] == n
        assert got.loc[i, "entropy"] == e


def test_zipf_slope_exact_powerlaw(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.text import zipf_slope

    # counts ~ 1000/rank => slope of ln(count) on ln(rank) is exactly -1
    # (up to the 1e-6 ln quantization)
    words = []
    for r in range(1, 11):
        words += [f"w{r:02d}"] * round(1000 / r)
    tab = pa.table({"text": pa.array([" ".join(words)])})
    out = zipf_slope(rd.from_arrow(tab), k=10).to_pandas()
    assert out["n_terms"][0] == 10
    assert abs(out["zipf_slope"][0] + 1.0) < 0.02


def test_distinctive_terms_and_kl(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.text import distinctive_terms, kl_divergence_by

    # source A over-indexes on 'alpha', B on 'beta'; 'common' is shared
    rows = []
    for i in range(30):
        rows.append(("A", "alpha common alpha common alpha"))
        rows.append(("B", "beta common beta common beta"))
    tab = pa.table({"source": pa.array([r[0] for r in rows]),
                    "text": pa.array([r[1] for r in rows])})
    ds = rd.from_arrow(tab)

    top = distinctive_terms(ds, key="source", k=1, min_count=5).to_pandas()
    top = top.set_index("source")
    assert top.loc["A", "word"] == "alpha"
    assert top.loc["B", "word"] == "beta"
    # p(alpha|A)=0.6, p(alpha)=0.3 => lift 2.0 exactly
    assert top.loc["A", "lift"] == 2.0

    kl = kl_divergence_by(ds, key="source").to_pandas().set_index("source")
    # symmetric construction => equal KL; reference value
    # 0.6 ln2 + 0.4 ln1 per source (common term has p_ws/p_w = 1)
    ref = 0.6 * math.log(0.6 / 0.3)
    assert abs(kl.loc["A", "kl"] - ref) < 1e-6
    assert kl.loc["A", "kl"] == kl.loc["B", "kl"]
    assert (kl["n_words"] == 150).all()


def test_entropy_batch_invariance(ray_session):
    """Entropy is a pure map: block layout must not change values."""
    import ray.data as rd

    from tsdat_ray.stages.text import word_entropy

    rng = np.random.default_rng(7)
    vocab = np.array(["a", "b", "c", "d", "e", "f"])
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 40)))
             for _ in range(300)]
    tab = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                    "text": pa.array(texts)})
    one = (word_entropy(rd.from_arrow(tab)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    many = (word_entropy(rd.from_arrow(tab).repartition(13)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert (one["entropy"] == many["entropy"]).all()
    assert (one["n_words"] == many["n_words"]).all()


def test_best_tier_planner():
    from tsdat_ray.stages.rollup import best_tier

    tiers = {"1m": 60, "1h": 3600, "1d": 86400}
    assert best_tier(7200, tiers) == "1h"       # 2h nests hours, not days
    assert best_tier(86400 * 7, tiers) == "1d"  # a week nests days
    assert best_tier(120, tiers) == "1m"        # 2m nests minutes only
    # nothing divides (90s/45s don't nest 1m windows) -> must read raw:
    # re-aggregating a non-nesting tier would silently mis-bucket.
    assert best_tier(90, tiers) == "raw"
    assert best_tier(45, tiers) == "raw"


def test_availability_report_reference(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.stats import availability_report

    # key A day0: minutes 0, 1, 5  -> span 6, present 3, missing 3
    # key A day1: minute 0 only    -> span 1, present 1, missing 0
    # key B day0: minutes 2, 3     -> span 2, present 2, missing 0
    us = 1_000_000
    rows = [("A", 0), ("A", 30), ("A", 60), ("A", 300), ("A", 330),
            ("A", 86400), ("B", 120), ("B", 180)]
    tab = pa.table({
        "event_type": pa.array([r[0] for r in rows]),
        "ts": pa.array(np.array([r[1] * us for r in rows],
                                dtype="datetime64[us]")),
    })
    got = (availability_report(rd.from_arrow(tab).repartition(3),
                               key="event_type", interval_s=60)
           .to_pandas().sort_values(["event_type", "day"])
           .reset_index(drop=True))
    assert got[["n_present", "span", "n_missing"]].values.tolist() == [
        [3, 6, 3], [1, 1, 0], [2, 2, 0]]
    assert got["uptime"].tolist() == [0.5, 1.0, 1.0]


def test_windowed_hist_block_invariance(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.stats import windowed_value_hist

    rng = np.random.default_rng(3)
    n = 5000
    tab = pa.table({
        "event_type": pa.array(rng.choice(["x", "y"], n)),
        "ts": pa.array((rng.integers(0, 86400 * 3, n)
                        * 1_000_000).astype("datetime64[us]")),
        "value": pa.array(rng.normal(10, 8, n)),
    })
    one = (windowed_value_hist(rd.from_arrow(tab), interval_s=3600)
           .to_pandas().sort_values(["event_type", "bucket", "bin"])
           .reset_index(drop=True))
    many = (windowed_value_hist(rd.from_arrow(tab).repartition(17),
                                interval_s=3600)
            .to_pandas().sort_values(["event_type", "bucket", "bin"])
            .reset_index(drop=True))
    assert (one == many).all().all()
    assert one["n"].sum() == n


def test_windowed_quantiles_disc_brute(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.window_funcs import windowed_quantiles_disc

    rng = np.random.default_rng(11)
    n = 4000
    ts = (rng.integers(0, 6 * 3600, n) * 1_000_000).astype("datetime64[us]")
    key = rng.choice(["a", "b"], n)
    val = np.round(rng.normal(50, 20, n), 2)
    tab = pa.table({"event_type": pa.array(key), "ts": pa.array(ts),
                    "value": pa.array(val)})
    got = (windowed_quantiles_disc(rd.from_arrow(tab).repartition(9),
                                   key="event_type", ts_col="ts",
                                   value_col="value", interval_s=3600)
           .to_pandas().set_index(["event_type", "bucket"]).sort_index())

    import pandas as pd

    df = pd.DataFrame({"k": key, "w": ts.astype("datetime64[s]").astype(np.int64)
                       // 3600 * 3600, "v": val})
    for (k, w), sub in df.groupby(["k", "w"]):
        vs = np.sort(sub["v"].to_numpy())
        bucket = np.datetime64(int(w) * 1_000_000, "us")
        for q, col in ((0.5, "qd50"), (0.95, "qd95")):
            ref = vs[int(np.ceil(len(vs) * q)) - 1]  # PERCENTILE_DISC
            assert got.loc[(k, bucket), col] == ref


def test_cohort_matrix_brute(ray_session):
    import pandas as pd
    import ray.data as rd

    from tsdat_ray.stages.stats import cohort_matrix

    rng = np.random.default_rng(5)
    n = 3000
    us = 1_000_000
    tab = pa.table({
        "user_id": pa.array(rng.integers(0, 40, n)),
        "ts": pa.array((rng.integers(0, 86400 * 20, n) * us)
                       .astype("datetime64[us]")),
    })
    got = (cohort_matrix(rd.from_arrow(tab).repartition(7), max_offset=5)
           .to_pandas().set_index(["cohort", "offset_d"]).sort_index())

    df = tab.to_pandas()
    df["day"] = df["ts"].dt.floor("D")
    first = df.groupby("user_id")["day"].transform("min")
    df["cohort"] = first
    df["offset_d"] = ((df["day"] - first).dt.days)
    ref = (df[(df.offset_d >= 0) & (df.offset_d <= 5)]
           .groupby(["cohort", "offset_d"])["user_id"].nunique())
    assert len(got) == len(ref)
    for (c, o), v in ref.items():
        assert got.loc[(c, o), "n_users"] == v


def test_funnel_steps_brute(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.stats import funnel_steps

    us = 1_000_000
    rows = [
        # user 0: full funnel in order
        (0, "signup", 0), (0, "click", 10), (0, "purchase", 20),
        # user 1: click BEFORE signup only -> stops at signup
        (1, "click", 5), (1, "signup", 10),
        # user 2: signup + click, purchase outside the 7d window
        (2, "signup", 0), (2, "click", 100),
        (2, "purchase", 8 * 86400),
        # user 3: purchase before click -> purchase not counted
        (3, "signup", 0), (3, "purchase", 5), (3, "click", 10),
        # user 4: never signs up
        (4, "click", 1), (4, "purchase", 2),
    ]
    tab = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array(np.array([r[2] * us for r in rows],
                                dtype="datetime64[us]")),
    })
    got = (funnel_steps(rd.from_arrow(tab).repartition(4),
                        steps=("signup", "click", "purchase"),
                        window_s=7 * 86400).to_pandas())
    assert got["n_signup"][0] == 4   # users 0,1,2,3
    assert got["n_click"][0] == 3    # users 0,2,3 (user 1 clicked too early)
    assert got["n_purchase"][0] == 1  # user 0 only


def test_trending_topk_brute(ray_session):
    import pandas as pd
    import ray.data as rd

    from tsdat_ray.stages.stats import trending_topk

    rng = np.random.default_rng(9)
    n = 4000
    us = 1_000_000
    tab = pa.table({
        "user_id": pa.array(rng.integers(0, 25, n)),
        "ts": pa.array((rng.integers(0, 86400 * 5, n) * us)
                       .astype("datetime64[us]")),
    })
    got = (trending_topk(rd.from_arrow(tab).repartition(11), k=3)
           .to_pandas().sort_values(["day", "n", "user_id"],
                                    ascending=[True, False, True])
           .reset_index(drop=True))

    df = tab.to_pandas()
    df["day"] = df["ts"].dt.floor("D")
    c = df.groupby(["day", "user_id"]).size().reset_index(name="n")
    ref = (c.sort_values(["n", "user_id"], ascending=[False, True],
                         kind="stable")
           .groupby("day", sort=True).head(3)
           .sort_values(["day", "n", "user_id"],
                        ascending=[True, False, True])
           .reset_index(drop=True))
    assert len(got) == len(ref)
    assert (got["user_id"].to_numpy() == ref["user_id"].to_numpy()).all()
    assert (got["n"].to_numpy() == ref["n"].to_numpy()).all()


def test_gzip_ratio_known(ray_session):
    import zlib

    import ray.data as rd

    from tsdat_ray.stages.text import gzip_ratio

    texts = ["a" * 1000, "the quick brown fox jumps over the lazy dog", ""]
    tab = pa.table({"doc_id": pa.array(range(3), pa.int64()),
                    "text": pa.array(texts)})
    got = (gzip_ratio(rd.from_arrow(tab)).to_pandas()
           .set_index("doc_id").sort_index())
    for i, t in enumerate(texts):
        assert got.loc[i, "raw_bytes"] == len(t.encode())
        assert got.loc[i, "gz_bytes"] == len(zlib.compress(t.encode(), 6))
    # the repetitive doc compresses far better than natural text
    assert got.loc[0, "gz_ratio"] < 0.05 < got.loc[1, "gz_ratio"]


def test_cli_report_over_store(tmp_path, ray_session):
    """CLI availability report over a real tier store; the CLI must reuse
    (and NOT shut down) an existing Ray session."""
    import contextlib
    import io
    import json

    import ray

    from tsdat_ray.__main__ import main
    from tsdat_ray.pipelines.rollup_pipeline import PipelineConfig, run_pipeline
    from tsdat_ray.synth import generate_sequences_parquet

    corpus = str(tmp_path / "corpus")
    generate_sequences_parquet(corpus, n_rows=3000, seed=7)
    out = str(tmp_path / "store")
    run_pipeline(corpus, PipelineConfig(out_root=out, run_id="rep"))

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["report", "--out", out, "--tier", "t1m",
                     "--interval-s", "60"]) == 0
    rep = json.loads(buf.getvalue())
    assert rep["partitions"] > 0
    assert all(0 < r["uptime"] <= 1.0 for r in rep["rows"])
    assert all(r["n_present"] + r["n_missing"] == r["span"]
               for r in rep["rows"])
    assert ray.is_initialized()  # session survived the CLI call


def test_ab_test_and_time_to_convert_brute(ray_session):
    import hashlib
    import math

    import ray.data as rd

    from tsdat_ray.stages.stats import ab_test_conversion, time_to_convert

    us = 1_000_000
    rows = []
    # 20 users: even sign up at t=u, convert (purchase) at t=u+100+u
    # iff u % 3 == 0; everyone also clicks
    for u in range(20):
        rows.append((u, "signup", u))
        rows.append((u, "click", u + 1))
        if u % 3 == 0:
            rows.append((u, "purchase", u + 100 + u))
    tab = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array(np.array([r[2] * us for r in rows],
                                dtype="datetime64[us]")),
        "value": pa.array([100.0] * len(rows)),
    })
    ds = rd.from_arrow(tab).repartition(5)

    got = ab_test_conversion(ds).to_pandas()
    arm_a = {u: hashlib.md5(str(u).encode()).hexdigest()[:8] < "80000000"
             for u in range(20)}
    conv = {u: (u % 3 == 0) for u in range(20)}
    n_a = sum(arm_a.values()); n_b = 20 - n_a
    c_a = sum(conv[u] for u in range(20) if arm_a[u])
    c_b = sum(conv[u] for u in range(20) if not arm_a[u])
    assert got["n_a"][0] == n_a and got["n_b"][0] == n_b
    assert got["conv_a"][0] == c_a and got["conv_b"][0] == c_b
    pp = (c_a + c_b) / 20
    zref = ((c_b / n_b) - (c_a / n_a)) / math.sqrt(
        pp * (1 - pp) * (1 / n_a + 1 / n_b))
    assert got["z"][0] == zref

    ttc = time_to_convert(ds, qs=(0.5, 0.9)).to_pandas()
    deltas = sorted(100 + u for u in range(20) if u % 3 == 0)
    assert ttc["n_converted"][0] == len(deltas)
    assert ttc["p50_s"][0] == deltas[int(np.ceil(len(deltas) * 0.5)) - 1]
    assert ttc["p90_s"][0] == deltas[int(np.ceil(len(deltas) * 0.9)) - 1]


def test_volume_anomaly_brute(ray_session):
    import math

    import ray.data as rd

    from tsdat_ray.stages.stats import volume_anomaly

    us = 1_000_000
    # type A: days 0..4 with counts 3,3,3,3,13 (day 4 is the anomaly)
    rows = []
    for d, c in enumerate([3, 3, 3, 3, 13]):
        rows += [("A", d * 86400 + i) for i in range(c)]
    rows += [("B", 10)]  # single day -> z must be 0 (no variance)
    tab = pa.table({
        "event_type": pa.array([r[0] for r in rows]),
        "ts": pa.array(np.array([r[1] * us for r in rows],
                                dtype="datetime64[us]")),
    })
    got = (volume_anomaly(rd.from_arrow(tab).repartition(4))
           .to_pandas().sort_values(["event_type", "day"])
           .reset_index(drop=True))
    a = got[got.event_type == "A"]
    assert a["n"].tolist() == [3, 3, 3, 3, 13]
    c, sx, sxx = 5, 25, 205
    sd = math.sqrt((c * sxx - sx * sx) / (c * (c - 1)))
    assert a["z"].iloc[-1] == (13 - 25 / 5) / sd
    assert got[got.event_type == "B"]["z"].iloc[0] == 0.0


def test_exact_dedup_sequences_brute(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.dedup import exact_dedup_sequences

    toks = [[1, 2, 3], [4, 5], [1, 2, 3], [6], [4, 5], [1, 2, 3], [7, 8]]
    ids = [f"d{i}" for i in range(len(toks))]
    tab = pa.table({"doc_id": pa.array(ids),
                    "tokens": pa.array(toks, pa.list_(pa.int32()))})
    got = sorted(exact_dedup_sequences(rd.from_arrow(tab).repartition(3))
                 .to_pandas()["doc_id"])
    assert got == ["d0", "d1", "d3", "d6"]  # min id per distinct array


def test_wav_container_decode_exact():
    """WAV payloads decode to the exact PCM samples (stdlib container
    parse); non-16-bit wav raises the documented NotImplementedError."""
    import io
    import wave

    import pytest

    from tsdat_ray.stages.multimodal import _decode_compressed, synth_media_table

    t = synth_media_table(n=24)
    codecs = t["codec"].to_pylist()
    assert "wav" in codecs and "pcm16" in codecs
    for i, c in enumerate(codecs):
        if c != "wav":
            continue
        payload = t["payload"][i].as_py()
        got = _decode_compressed("wav", payload)
        with wave.open(io.BytesIO(payload), "rb") as w:
            ref = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        np.testing.assert_array_equal(got, ref)

    # r4: every uncompressed width decodes (8/24/32-bit int + IEEE float)
    def wav_bytes(fmt_code, bits, data):
        import struct

        blk = max(1, bits // 8)
        fmt = struct.pack("<HHIIHH", fmt_code, 1, 8000, 8000 * blk, blk, bits)
        body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data
                + (b"\x00" if len(data) & 1 else b""))
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    got8 = _decode_compressed("wav", wav_bytes(1, 8, bytes([0, 128, 255])))
    np.testing.assert_array_equal(got8, np.array([0, 128, 255], np.uint8))

    s24 = np.array([-(1 << 23), 0, (1 << 23) - 1], np.int64)
    raw24 = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in s24)
    got24 = _decode_compressed("wav", wav_bytes(1, 24, raw24))
    np.testing.assert_array_equal(got24 >> 8, s24)  # top-3-byte promotion

    s32 = np.array([-2147483648, 7, 2147483647], "<i4")
    np.testing.assert_array_equal(
        _decode_compressed("wav", wav_bytes(1, 32, s32.tobytes())), s32)

    f32 = np.array([-1.0, 0.25, 0.999], "<f4")
    np.testing.assert_array_equal(
        _decode_compressed("wav", wav_bytes(3, 32, f32.tobytes())), f32)
    f64 = np.array([-0.5, 0.125], "<f8")
    np.testing.assert_array_equal(
        _decode_compressed("wav", wav_bytes(3, 64, f64.tobytes())), f64)

    with pytest.raises(NotImplementedError, match="audio format"):
        _decode_compressed("wav", wav_bytes(85, 16, b"\x00\x00"))  # mp3 fmt


def test_audio_features_multi_width(ray_session):
    """AudioFeatures over >= 2 sample widths in one batch: dtype-aware
    normalization makes a full-scale sine at 16-bit and at float32 yield
    the same clip rms/peak (within int quantization)."""
    import struct

    import ray.data as rd

    from tsdat_ray.stages.multimodal import AudioFeatures

    def wav_bytes(fmt_code, bits, data):
        blk = max(1, bits // 8)
        fmt = struct.pack("<HHIIHH", fmt_code, 1, 8000, 8000 * blk, blk, bits)
        body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    t = np.linspace(0, 1, 8000, endpoint=False)
    sine = np.sin(2 * np.pi * 5 * t)
    p16 = wav_bytes(1, 16, (sine * 32767).astype("<i2").tobytes())
    pf32 = wav_bytes(3, 32, sine.astype("<f4").tobytes())
    p8 = wav_bytes(1, 8, (sine * 127 + 128).astype(np.uint8).tobytes())
    tab = pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "codec": pa.array(["wav"] * 3),
        "payload": pa.array([p16, pf32, p8], pa.binary()),
        "sample_rate": pa.array([8000] * 3, pa.int64()),
    })
    out = (rd.from_arrow(tab)
           .map_batches(AudioFeatures, batch_format="pyarrow", concurrency=1)
           .to_pandas().sort_values("media_id"))
    rms_ref = float(np.sqrt((sine ** 2).mean()))
    assert abs(out["rms"].iloc[0] - rms_ref) < 1e-3   # 16-bit
    assert abs(out["rms"].iloc[1] - rms_ref) < 1e-6   # float32
    assert abs(out["rms"].iloc[2] - rms_ref) < 1e-2   # 8-bit
    assert (out["duration_s"] == 1.0).all()


def test_salted_folds_high_cardinality(ray_session):
    """200k distinct users through the salted-fold ops: per-task work is
    bounded by salt slices (64 groups), never user cardinality — the
    r2-review law.  Correctness spot-checked against pandas."""
    import ray.data as rd

    from tsdat_ray.stages.stats import ab_test_conversion, trending_topk

    rng = np.random.default_rng(13)
    n = 400_000
    users = rng.integers(0, 200_000, n)
    types = np.where(rng.random(n) < 0.1, "purchase", "view")
    ts = (rng.integers(0, 3 * 86400, n) * 1_000_000).astype("datetime64[us]")
    tab = pa.table({"user_id": pa.array(users),
                    "event_type": pa.array(types),
                    "ts": pa.array(ts),
                    "value": pa.array(np.full(n, 100.0))})
    ds = rd.from_arrow(tab).repartition(8)

    ab = ab_test_conversion(ds).to_pandas()
    assert ab["n_a"][0] + ab["n_b"][0] == len(np.unique(users))
    import pandas as pd

    conv_users = np.unique(users[types == "purchase"])
    assert ab["conv_a"][0] + ab["conv_b"][0] == len(conv_users)

    top = trending_topk(ds, key="user_id", bucket_s=86400, k=2).to_pandas()
    df = pd.DataFrame({"u": users,
                       "d": ts.astype("datetime64[D]").astype("datetime64[us]")})
    c = df.groupby(["d", "u"]).size().reset_index(name="n")
    ref = (c.sort_values(["n", "u"], ascending=[False, True], kind="stable")
           .groupby("d", sort=True).head(2))
    got = top.sort_values(["day", "n", "user_id"],
                          ascending=[True, False, True]).reset_index(drop=True)
    ref = ref.sort_values(["d", "n", "u"],
                          ascending=[True, False, True]).reset_index(drop=True)
    assert (got["user_id"].to_numpy() == ref["u"].to_numpy()).all()
    assert (got["n"].to_numpy() == ref["n"].to_numpy()).all()


def test_topk_token_bigrams_brute(ray_session):
    import pandas as pd
    import ray.data as rd

    from tsdat_ray.stages.sampling import topk_token_bigrams

    rng = np.random.default_rng(21)
    toks = [rng.integers(0, 7, rng.integers(1, 12)).astype(np.int32).tolist()
            for _ in range(300)]
    tab = pa.table({"tokens": pa.array(toks, pa.list_(pa.int32()))})
    got = (topk_token_bigrams(rd.from_arrow(tab).repartition(9), k=10)
           .to_pandas())

    from collections import Counter

    c = Counter()
    for t in toks:
        for a, b in zip(t, t[1:]):
            c[(a, b)] += 1
    ref = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["tok_a"], got["tok_b"], got["n"])) == [
        (a, b, n) for (a, b), n in ref]


def test_retention_curve_normalizes_to_one_at_offset0(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.stats import retention_curve

    rng = np.random.default_rng(17)
    n = 2000
    tab = pa.table({
        "user_id": pa.array(rng.integers(0, 50, n)),
        "ts": pa.array((rng.integers(0, 86400 * 10, n) * 1_000_000)
                       .astype("datetime64[us]")),
    })
    got = retention_curve(rd.from_arrow(tab).repartition(5),
                          max_offset=5).to_pandas()
    d0 = got[got.offset_d == 0]
    assert (d0["retention"] == 1.0).all()
    assert ((got["retention"] > 0) & (got["retention"] <= 1.0)).all()
