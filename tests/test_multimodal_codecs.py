"""Real multimodal decode: stdlib codec round-trips (PNG incl. all five
scanline filters, BMP, PPM, WAV, RFV1 frames) and the Spark pipelines over
genuinely encoded payloads."""

import struct

import numpy as np
import pytest

from bloomine_spark.functions import codecs


def _rand_img(h, w, c=None, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c is None else (h, w, c)
    return rng.integers(0, 256, shape, dtype=np.uint8)


# ---------------------------------------------------------------- codecs

@pytest.mark.parametrize("shape", [(17, 23), (17, 23, 3), (8, 8, 4)])
def test_png_roundtrip(shape):
    img = _rand_img(*shape[:2], c=shape[2] if len(shape) == 3 else None)
    out = codecs.decode_png(codecs.encode_png(img))
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decode_each_filter_type(ftype):
    """Hand-filter scanlines per the PNG spec and assert the decoder's
    unfiltering reconstructs the original — covers Sub/Up/Average/Paeth,
    which our own encoder (filter 0) never produces."""
    img = _rand_img(9, 13, seed=ftype)
    h, w = img.shape
    prev = np.zeros(w, np.int32)
    body = bytearray()
    for y in range(h):
        row = img[y].astype(np.int32)
        left = np.concatenate(([0], row[:-1]))
        ul = np.concatenate(([0], prev[:-1]))
        if ftype == 0:
            filt = row
        elif ftype == 1:
            filt = row - left
        elif ftype == 2:
            filt = row - prev
        elif ftype == 3:
            filt = row - ((left + prev) >> 1)
        else:  # Paeth
            filt = np.empty(w, np.int32)
            for x in range(w):
                a, b, c = int(left[x]), int(prev[x]), int(ul[x])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[x] = row[x] - pred
        body.append(ftype)
        body += (filt & 0xFF).astype(np.uint8).tobytes()
        prev = row
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    data = (
        codecs.PNG_SIG
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(bytes(body)))
        + codecs._chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(codecs.decode_png(data), img)


def test_bmp_roundtrip():
    img = _rand_img(11, 7, c=3, seed=3)  # width*3 not divisible by 4 → padding
    np.testing.assert_array_equal(codecs.decode_bmp(codecs.encode_bmp(img)), img)


def test_ppm_roundtrip_and_comments():
    img = _rand_img(6, 9, c=3, seed=4)
    enc = codecs.encode_ppm(img)
    np.testing.assert_array_equal(codecs.decode_ppm(enc), img)
    commented = b"P6\n# a comment\n9 6\n# another\n255\n" + img.tobytes()
    np.testing.assert_array_equal(codecs.decode_ppm(commented), img)


def test_wav_roundtrip():
    rng = np.random.default_rng(5)
    samples = rng.integers(-30000, 30000, 4000, dtype=np.int16)
    out, sr = codecs.decode_wav(codecs.encode_wav(samples, 8000))
    assert sr == 8000
    np.testing.assert_array_equal(out[:, 0], samples)


def test_rfv1_frames_roundtrip():
    frames = [b"frame0", b"xx", b""]
    got = list(codecs.iter_frames(codecs.encode_frames(frames)))
    assert got == [(0, b"frame0"), (1, b"xx"), (2, b"")]


def test_non_png_rejected():
    with pytest.raises(ValueError):
        codecs.decode_png(b"JFIF not a png")


# ----------------------------------------------------------- Spark paths

@pytest.mark.parametrize("codec", ["png", "bmp", "ppm"])
def test_real_image_decode_pipeline(spark, codec):
    """Real encoded payloads decode to the SAME grid features as the fake
    raw path — the underlying synthetic image is identical, so the codec
    round-trips inside the distributed pipeline."""
    from bloomine_spark.operators.multimodal import (
        decode_image_features,
        synthetic_media,
    )

    real = synthetic_media(spark, 30, codec=codec)
    feats = decode_image_features(real, decoder="auto", grid=4).toPandas()
    fake = decode_image_features(
        synthetic_media(spark, 30, codec="fake-raw"), decoder="fake", grid=4
    ).toPandas()
    a = feats.sort_values("media_id").reset_index(drop=True)
    b = fake.sort_values("media_id").reset_index(drop=True)
    assert list(a["media_id"]) == list(b["media_id"])
    assert (a["width"] == b["width"]).all() and (a["height"] == b["height"]).all()
    for x, y in zip(a["features"], b["features"]):
        np.testing.assert_allclose(x, y, rtol=1e-5)


def test_audio_features_pipeline(spark):
    from bloomine_spark.operators.multimodal import audio_features, synthetic_audio

    clips = synthetic_audio(spark, 20, sample_rate=8000)
    feats = audio_features(clips).toPandas()
    assert len(feats) == 20
    assert (feats["sample_rate"] == 8000).all()
    # sine-dominated signal: RMS near 0.5/sqrt(2)*32767, ZCR ≈ 2f/sr
    assert (feats["rms"] > 5000).all() and (feats["rms"] < 20000).all()
    assert (feats["zero_cross_rate"] > 0.01).all()
    assert (feats["duration_sec"] > 0.1).all()


def test_video_frame_sampling_pipeline(spark):
    from bloomine_spark.operators.multimodal import (
        decode_image_features,
        sample_video_frames,
        synthetic_video,
    )
    from pyspark.sql import functions as F

    clips = synthetic_video(spark, 5, frames_per_clip=12)
    frames = sample_video_frames(clips, every_n=4, decoder="rfv1")
    pdf = frames.toPandas()
    assert len(pdf) == 5 * 3  # frames 0, 4, 8 per clip
    assert sorted(set(pdf["frame_idx"])) == [0, 4, 8]
    # sampled frames are real PNGs → feed them back through image decode
    as_media = frames.select(
        F.concat_ws("#", "media_id", F.col("frame_idx").cast("string")).alias(
            "media_id"
        ),
        F.lit("image").alias("media_type"),
        F.col("frame").alias("payload"),
        F.create_map().alias("meta"),
    )
    feats = decode_image_features(as_media, decoder="auto").toPandas()
    assert len(feats) == 15
    assert (feats["width"] >= 16).all()


# ----------------------------------------------------------- JPEG

def _smooth_image(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return (
        128 + 80 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
        + 40 * (xx + yy) / (h + w - 2)
    ).clip(0, 255).astype(np.uint8)


@pytest.mark.parametrize("shape", [(40, 56), (41, 53), (8, 8), (17, 9)])
def test_jpeg_roundtrip_gray(shape):
    img = _smooth_image(*shape)
    dec = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=90))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 8, err.max()   # q=90 on a smooth image


def test_jpeg_roundtrip_rgb():
    base = _smooth_image(40, 56)
    rgb = np.stack([base, np.roll(base, 5, 1), 255 - base], axis=2)
    dec = codecs.decode_jpeg(codecs.encode_jpeg(rgb, quality=92))
    assert dec.shape == rgb.shape
    err = np.abs(dec.astype(int) - rgb.astype(int))
    assert err.max() <= 16 and err.mean() < 3.0, (err.max(), err.mean())


def test_jpeg_decodes_jdk_420_fixture():
    """Interop with an independent codec: a 4:2:0-subsampled JPEG written
    by the JDK's javax.imageio (tests/data/jdk_420.jpg) must decode to the
    stored source pixels within lossy bounds — exercises multi-table DHT,
    chroma subsampling and the upsample path, none of which our own 4:4:4
    encoder produces."""
    import os

    d = os.path.join(os.path.dirname(__file__), "data")
    dec = codecs.decode_jpeg(open(os.path.join(d, "jdk_420.jpg"), "rb").read())
    lines = open(os.path.join(d, "jdk_420_source.txt")).read().split()
    w, h = int(lines[0]), int(lines[1])
    src = np.array(lines[2:], dtype=int).reshape(h, w, 3)
    assert dec.shape == (h, w, 3)
    err = np.abs(dec.astype(int) - src)
    # lossy 4:2:0 with nearest-neighbor chroma upsampling: chroma edges
    # carry the max error
    assert err.mean() < 5.0 and err.max() <= 40, (err.mean(), err.max())


@pytest.mark.parametrize("interval", [1, 3, 7])
def test_jpeg_restart_interval_roundtrip(interval):
    """DRI/RST streams (ADVICE r4-high): an MCU boundary reached with >=16
    bits still buffered used to leave the FF D0-D7 bytes unconsumed, so
    every later MCU decoded from zero padding. Restart markers must be
    pixel-neutral: same quantized coefficients, same output."""
    img = _smooth_image(48, 64)  # 48 MCUs gray
    enc = codecs.encode_jpeg(img, quality=90, restart_interval=interval)
    assert b"\xff\xdd" in enc  # DRI segment present
    dec = codecs.decode_jpeg(enc)
    ref = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=90))
    assert np.array_equal(dec, ref)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8


def test_jpeg_restart_unlatched_marker_case():
    """Pinned reproducer for the exact failure mode: rng(1) noise at q=50,
    interval=1 reaches MCU boundaries with >=16 bits buffered, so _fill has
    NOT latched the RST marker and restart() must find it at self.pos
    (verified by instrumentation: 8 unlatched boundaries in this stream)."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    enc = codecs.encode_jpeg(img, quality=50, restart_interval=1)
    dec = codecs.decode_jpeg(enc)
    ref = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=50))
    assert np.array_equal(dec, ref)


def test_jpeg_restart_interval_roundtrip_rgb():
    base = _smooth_image(40, 56)
    rgb = np.stack([base, np.roll(base, 5, 1), 255 - base], axis=2)
    enc = codecs.encode_jpeg(rgb, quality=92, restart_interval=2)
    dec = codecs.decode_jpeg(enc)
    ref = codecs.decode_jpeg(codecs.encode_jpeg(rgb, quality=92))
    assert np.array_equal(dec, ref)


def test_jpeg_progressive_interop_jdk_decode():
    """Progressive (SOF2) decode vs an independent codec decoding the SAME
    stream: javax.imageio wrote tests/data/jdk_progressive*.jpg (10-scan
    color 4:2:0, 6-scan gray at odd dims — spectral selection AND
    successive approximation) and its own decoded pixels are stored
    alongside. Grayscale must match the JDK bit-for-bit up to IDCT
    rounding (±1 — no upsampling in the path); color is bounded by the
    chroma upsampling difference (JDK triangle filter vs our nearest)."""
    import os

    d = os.path.join(os.path.dirname(__file__), "data")

    def load(ref, ch3):
        t = open(os.path.join(d, ref)).read().split()
        w, h = int(t[0]), int(t[1])
        return np.array(t[2:], dtype=int).reshape(
            (h, w, 3) if ch3 else (h, w)
        )

    g = open(os.path.join(d, "jdk_progressive_gray.jpg"), "rb").read()
    assert b"\xff\xc2" in g  # really SOF2
    dec_g = codecs.decode_jpeg(g)
    jdk_g = load("jdk_progressive_gray_jdkdecode.txt", False)
    assert dec_g.shape == jdk_g.shape == (29, 41)
    assert np.abs(dec_g.astype(int) - jdk_g).max() <= 1

    c = open(os.path.join(d, "jdk_progressive.jpg"), "rb").read()
    assert b"\xff\xc2" in c and c.count(b"\xff\xda") == 10
    dec_c = codecs.decode_jpeg(c)
    jdk_c = load("jdk_progressive_jdkdecode.txt", True)
    assert dec_c.shape == jdk_c.shape == (40, 56, 3)
    err = np.abs(dec_c.astype(int) - jdk_c)
    assert err.mean() < 4.0 and err.max() <= 40, (err.mean(), err.max())
    # and against the pre-compression SOURCE pixels (end-to-end lossy gate)
    src = load("jdk_progressive_source.txt", True)
    err_s = np.abs(dec_c.astype(int) - src)
    assert err_s.mean() < 5.0 and err_s.max() <= 40


def test_jpeg_unsupported_rejected():
    # SOF3 (lossless) must still raise, not misdecode; garbage raises
    import struct as _s

    sof3 = b"\xff\xc3" + _s.pack(">HBHHB", 11, 8, 8, 8, 1) + b"\x01\x11\x00"
    with pytest.raises(NotImplementedError):
        codecs.decode_jpeg(b"\xff\xd8" + sof3 + b"\xff\xd9")
    with pytest.raises(ValueError):
        codecs.decode_jpeg(b"notajpeg")
    # SOF2 with no SOS is malformed, not silently empty
    sof2 = b"\xff\xc2" + _s.pack(">HBHHB", 11, 8, 8, 8, 1) + b"\x01\x11\x00"
    with pytest.raises(ValueError):
        codecs.decode_jpeg(b"\xff\xd8" + sof2 + b"\xff\xd9")


def test_video_frame_sampling_jpeg_frames(spark):
    """RFV1 clips with baseline-JPEG frames: sample → auto-sniff decode →
    features, whole pipeline on really-encoded lossy frames."""
    from bloomine_spark.operators.multimodal import (
        decode_image_features,
        sample_video_frames,
        synthetic_video,
    )

    clips = synthetic_video(spark, 4, frames_per_clip=6, frame_codec="jpeg")
    frames = sample_video_frames(clips, every_n=3)
    feats = (
        decode_image_features(
            frames.selectExpr("concat(media_id, '#', frame_idx) AS media_id",
                              "'image' AS media_type", "frame AS payload",
                              "map() AS meta"),
            decoder="auto",
        ).toPandas()
    )
    assert len(feats) == 4 * 2  # frames 0 and 3 of each clip
    assert (feats["width"] > 0).all() and feats["features"].map(len).eq(16).all()


# ------------------------------------------------- MP3/MP4 metadata parse

def _mp3_bytes(n_frames=10, id3=False):
    """Spec-built MPEG1 Layer III stream: 44100 Hz, 128 kbps, joint
    stereo; frame length = floor(1152/8 * 128000/44100) = 417 bytes."""
    frame = bytes([0xFF, 0xFB, 0x90, 0x40]) + b"\x00" * 413
    data = frame * n_frames
    if id3:
        tag = b"ID3" + b"\x04\x00" + b"\x00" + bytes([0, 0, 0, 100]) + b"\x00" * 100
        data = tag + data
    return data


def _mp4_box(typ, *payload):
    import struct as _s

    body = b"".join(payload)
    return _s.pack(">I", 8 + len(body)) + typ + body


def _mp4_bytes():
    import struct as _s

    ftyp = _mp4_box(b"ftyp", b"isom", _s.pack(">I", 512), b"iso2avc1")
    mvhd = _mp4_box(b"mvhd", b"\x00\x00\x00\x00", _s.pack(">II", 0, 0),
                    _s.pack(">II", 1000, 5000), b"\x00" * 80)
    tkhd = _mp4_box(b"tkhd", b"\x00\x00\x00\x07", b"\x00" * 72,
                    _s.pack(">II", 640 << 16, 360 << 16))
    mdhd = _mp4_box(b"mdhd", b"\x00\x00\x00\x00", _s.pack(">II", 0, 0),
                    _s.pack(">II", 600, 3000), b"\x00\x00\x00\x00")
    hdlr = _mp4_box(b"hdlr", b"\x00\x00\x00\x00", b"\x00\x00\x00\x00",
                    b"vide", b"\x00" * 13)
    stsd = _mp4_box(b"stsd", b"\x00\x00\x00\x00", _s.pack(">I", 1),
                    _s.pack(">I", 86), b"avc1", b"\x00" * 78)
    stts = _mp4_box(b"stts", b"\x00\x00\x00\x00", _s.pack(">I", 2),
                    _s.pack(">II", 100, 200), _s.pack(">II", 50, 100))
    stbl = _mp4_box(b"stbl", stsd, stts)
    minf = _mp4_box(b"minf", stbl)
    mdia = _mp4_box(b"mdia", mdhd, hdlr, minf)
    trak = _mp4_box(b"trak", tkhd, mdia)
    moov = _mp4_box(b"moov", mvhd, trak)
    return ftyp + moov


def test_mp3_metadata_frame_walk():
    m = codecs.parse_mp3_metadata(_mp3_bytes(10))
    assert m["codec"] == "mpeg1-layer3" and m["sample_rate"] == 44100
    assert m["channels"] == 2 and m["n_frames"] == 10
    assert m["duration_sec"] == pytest.approx(10 * 1152 / 44100, abs=1e-6)
    assert m["bitrate_kbps"] == 128
    # ID3v2 tag skipped, same frames found
    m2 = codecs.parse_mp3_metadata(_mp3_bytes(10, id3=True))
    assert m2["n_frames"] == 10
    with pytest.raises(ValueError):
        codecs.parse_mp3_metadata(b"\x00" * 64)


def test_mp4_metadata_box_walk():
    meta = codecs.parse_mp4_metadata(_mp4_bytes())
    assert meta["brand"] == "isom"
    assert meta["duration_sec"] == pytest.approx(5.0)
    (tr,) = meta["tracks"]
    assert tr["handler"] == "vide" and tr["codec"] == "avc1"
    assert (tr["width"], tr["height"]) == (640, 360)
    assert tr["n_samples"] == 150
    assert tr["duration_sec"] == pytest.approx(5.0)
    with pytest.raises(ValueError):
        codecs.parse_mp4_metadata(b"\x00\x00\x00\x08abcd")


def test_audio_video_metadata_operators(spark):
    """audio_metadata/video_metadata: per-payload container sniff (WAV
    and MP3; RFV1 and MP4) — the cheap real-format path; full MP3/H.264
    decode stays the documented boundary."""
    from bloomine_spark.operators.multimodal import (
        audio_metadata,
        synthetic_video,
        video_metadata,
    )

    samples = (np.sin(np.arange(8000) / 20.0) * 20000).astype(np.int16)
    wav = codecs.encode_wav(samples, 8000)
    rows = [
        ("w0", "audio", bytearray(wav), {}),
        ("m0", "audio", bytearray(_mp3_bytes(20)), {}),
    ]
    media = spark.createDataFrame(
        rows, "media_id string, media_type string, payload binary, "
        "meta map<string,string>"
    )
    am = {r["media_id"]: r.asDict() for r in audio_metadata(media).collect()}
    assert am["w0"]["container"] == "wav"
    assert am["w0"]["sample_rate"] == 8000 and am["w0"]["n_frames"] == 8000
    assert am["w0"]["duration_sec"] == pytest.approx(1.0)
    assert am["m0"]["container"] == "mp3" and am["m0"]["n_frames"] == 20
    assert am["m0"]["duration_sec"] == pytest.approx(20 * 1152 / 44100,
                                                    abs=1e-5)

    vid_rows = [("v0", "video", bytearray(_mp4_bytes()), {})]
    vmedia = spark.createDataFrame(
        vid_rows, "media_id string, media_type string, payload binary, "
        "meta map<string,string>"
    ).unionByName(synthetic_video(spark, 2, frames_per_clip=5))
    vm = {r["media_id"]: r.asDict() for r in video_metadata(vmedia).collect()}
    assert vm["v0"]["container"] == "mp4" and vm["v0"]["codec"] == "avc1"
    assert (vm["v0"]["width"], vm["v0"]["height"]) == (640, 360)
    assert vm["v0"]["n_frames"] == 150
    assert vm["v0"]["duration_sec"] == pytest.approx(5.0)
    assert vm["v00000000"]["container"] == "rfv1"
    assert vm["v00000000"]["n_frames"] == 5


def test_jpeg_progressive_encoder_roundtrip():
    """Own progressive (SOF2) encoder, spectral selection only: identical
    quantized coefficients to the baseline encoder at the same quality →
    both streams must decode to the SAME pixels. Covers multi-scan DC +
    AC band scans, EOB0 and ZRL paths in the progressive decoder without
    external fixtures."""
    base = _smooth_image(41, 53)
    rgb = np.stack([base, np.roll(base, 5, 1), 255 - base], axis=2)
    noise = np.random.default_rng(7).integers(0, 256, (24, 24),
                                              dtype=np.uint8)
    for img, q in ((base, 90), (rgb, 92), (noise, 40)):
        enc = codecs.encode_jpeg_progressive(img, quality=q)
        assert b"\xff\xc2" in enc and b"\xff\xc0" not in enc
        nc = 1 if img.ndim == 2 else 3
        assert enc.count(b"\xff\xda") == 1 + 2 * nc  # DC + 2 AC bands/comp
        dec = codecs.decode_jpeg(enc)
        ref = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=q))
        assert np.array_equal(dec, ref), (img.shape, q)


def test_jpeg_progressive_encoder_jdk_interop(tmp_path):
    """The JDK's javax.imageio must decode OUR progressive stream (the
    encode-direction interop; decode-direction is covered by the checked-in
    JDK fixtures). Skips when no JVM is available."""
    import shutil as _sh
    import subprocess

    if not (_sh.which("java") and _sh.which("javac")):
        pytest.skip("no JVM on PATH")
    base = _smooth_image(41, 53)
    rgb = np.stack([base, np.roll(base, 5, 1), 255 - base], axis=2)
    (tmp_path / "p.jpg").write_bytes(
        codecs.encode_jpeg_progressive(rgb, quality=92)
    )
    src = (
        "import javax.imageio.ImageIO;import java.awt.image.BufferedImage;"
        "import java.io.*;public class Dec{public static void main(String[] a)"
        " throws Exception{BufferedImage i=ImageIO.read(new File(a[0]));"
        "PrintWriter p=new PrintWriter(a[1]);p.println(i.getWidth());"
        "p.println(i.getHeight());for(int y=0;y<i.getHeight();y++)"
        "for(int x=0;x<i.getWidth();x++){int v=i.getRGB(x,y);"
        "p.println(((v>>16)&255)+\" \"+((v>>8)&255)+\" \"+(v&255));}"
        "p.close();}}"
    )
    (tmp_path / "Dec.java").write_text(src)
    subprocess.run(["javac", "Dec.java"], cwd=tmp_path, check=True,
                   capture_output=True, timeout=120)
    subprocess.run(["java", "Dec", "p.jpg", "out.txt"], cwd=tmp_path,
                   check=True, capture_output=True, timeout=120)
    t = (tmp_path / "out.txt").read_text().split()
    w, h = int(t[0]), int(t[1])
    jdk = np.array(t[2:], dtype=int).reshape(h, w, 3)
    assert (h, w) == rgb.shape[:2]
    err = np.abs(jdk.astype(int) - rgb.astype(int))
    assert err.mean() < 3.0 and err.max() <= 25, (err.mean(), err.max())


def test_jpeg_progressive_sa_encoder_roundtrip_fuzz():
    """Successive-approximation progressive encoder: full scan script
    (DC first/refine + per-component AC first/refine at Al=1→0). Same
    quantized coefficients as the baseline encoder → pixel-identical
    decode, fuzzed over seeded random images. Seed 16 is the pinned
    regression: a block with a >16-zero run INTERLEAVED with previously-
    significant coefficients — correction bits must not be flushed past
    the ZRL's 16-zero window (spec G.7; the bug desynced the bitstream
    and poisoned every later block)."""
    for seed in (16, 0, 3, 7, 11, 42):
        rng = np.random.default_rng(seed)
        img = rng.integers(
            0, 256, (int(rng.integers(8, 40)), int(rng.integers(8, 40))),
            dtype=np.uint8,
        )
        q = int(rng.integers(25, 96))
        enc = codecs.encode_jpeg_progressive_sa(img, quality=q)
        assert b"\xff\xc2" in enc
        assert enc.count(b"\xff\xda") == 4  # DC, AC, DC-refine, AC-refine
        dec = codecs.decode_jpeg(enc)
        ref = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=q))
        assert np.array_equal(dec, ref), (seed, q)
    # RGB: 3 comps -> 1 DC + 3 AC + 1 DC-refine + 3 AC-refine scans
    base = _smooth_image(41, 53)
    rgb = np.stack([base, np.roll(base, 5, 1), 255 - base], axis=2)
    enc = codecs.encode_jpeg_progressive_sa(rgb, quality=92)
    assert enc.count(b"\xff\xda") == 8
    assert np.array_equal(
        codecs.decode_jpeg(enc),
        codecs.decode_jpeg(codecs.encode_jpeg(rgb, quality=92)),
    )


def _data(name):
    import os

    return os.path.join(os.path.dirname(__file__), "data", name)


def test_png_palette_jdk_fixture_pixel_exact():
    """Interop: a 16-color TYPE_BYTE_INDEXED palette PNG written by
    javax.imageio (tests/data/jdk_palette.png, generator GenPng.java) must
    decode pixel-exactly to PLTE[idx] — palette is lossless, so the bound
    is equality, not a lossy window (r5 verdict missing-#2)."""
    idx = np.array(
        [[int(v) for v in l.split(",")]
         for l in open(_data("jdk_palette_idx.txt"))],
        dtype=np.uint8,
    )
    plte = np.array(
        [[int(v) for v in l.split(",")]
         for l in open(_data("jdk_palette_plte.txt"))],
        dtype=np.uint8,
    )
    dec = codecs.decode_png(open(_data("jdk_palette.png"), "rb").read())
    assert dec.shape == idx.shape + (3,)
    assert (dec == plte[idx]).all()


def test_png_interlaced_jdk_fixture_pixel_exact():
    """Interop: an Adam7-interlaced RGB PNG written by javax.imageio
    (ImageWriteParam.MODE_DEFAULT) decodes pixel-exactly — exercises the
    7-pass sub-image geometry and per-pass filter reset on a real
    encoder's filter choices, not just our filter-0 synthetics."""
    rgb = np.array(
        [[[int(v) for v in px.split(",")] for px in l.strip().split(";")]
         for l in open(_data("jdk_interlaced_rgb.txt"))],
        dtype=np.uint8,
    )
    dec = codecs.decode_png(open(_data("jdk_interlaced.png"), "rb").read())
    assert dec.shape == rgb.shape
    assert (dec == rgb).all()


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
@pytest.mark.parametrize("interlace", [0, 1])
def test_png_palette_depths_and_adam7_roundtrip(depth, interlace):
    """Synthetic palette PNGs at every legal sub-byte depth, interlaced and
    not, with tRNS: decode must reproduce PLTE[idx] (and alpha) exactly.
    The writer below packs MSB-first bit groups and splits Adam7 passes
    per spec §8.2 independently of the decoder's tables."""
    import struct
    import zlib

    from bloomine_spark.functions.codecs import PNG_SIG, _ADAM7, _chunk

    rng = np.random.default_rng(depth * 10 + interlace)
    n_colors = 1 << depth
    plte = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, (21, 13), dtype=np.uint8)
    trns = [13, 200] if depth >= 2 else None

    def pack_rows(sub):
        hh, ww = sub.shape
        if depth == 8:
            flat = sub
        else:
            per = 8 // depth
            pad = (-ww) % per
            p = np.pad(sub, ((0, 0), (0, pad)))
            bits = ((p[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1
                    ).astype(np.uint8)
            flat = np.packbits(bits.reshape(hh, -1), axis=1)
        return np.concatenate(
            [np.zeros((hh, 1), np.uint8), flat], axis=1
        ).tobytes()

    if interlace:
        raw = b"".join(
            pack_rows(idx[y0::dy, x0::dx])
            for x0, y0, dx, dy in _ADAM7
            if idx[y0::dy, x0::dx].size
        )
    else:
        raw = pack_rows(idx)
    ihdr = struct.pack(">IIBBBBB", 13, 21, depth, 3, 0, 0, interlace)
    png = PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte.tobytes())
    if trns:
        png += _chunk(b"tRNS", bytes(trns))
    png += _chunk(b"IDAT", zlib.compress(raw, 6)) + _chunk(b"IEND", b"")

    dec = codecs.decode_png(png)
    if trns:
        assert dec.shape == (21, 13, 4)
        alpha = np.full(n_colors, 255, np.uint8)
        alpha[: len(trns)] = trns
        assert (dec[:, :, 3] == alpha[idx]).all()
        assert (dec[:, :, :3] == plte[idx]).all()
    else:
        assert (dec == plte[idx]).all()


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_interlaced_truecolor_roundtrip(ch):
    """Adam7 gray/RGB/RGBA synthetics incl. degenerate sizes where several
    passes are empty (1-pixel-high, 2-wide)."""
    import struct
    import zlib

    from bloomine_spark.functions.codecs import PNG_SIG, _ADAM7, _chunk

    rng = np.random.default_rng(ch)
    for shape in ((21, 13), (1, 9), (3, 2), (8, 8)):
        img = rng.integers(
            0, 256, shape + ((ch,) if ch > 1 else ()), dtype=np.uint8
        )
        h, w = shape
        ctype = {1: 0, 3: 2, 4: 6}[ch]
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            flat = sub.reshape(sub.shape[0], -1)
            parts.append(
                np.concatenate(
                    [np.zeros((sub.shape[0], 1), np.uint8), flat], axis=1
                ).tobytes()
            )
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1)
        png = (PNG_SIG + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", zlib.compress(b"".join(parts), 6))
               + _chunk(b"IEND", b""))
        dec = codecs.decode_png(png)
        assert dec.shape == img.shape and (dec == img).all(), (ch, shape)


def test_png_palette_encoder_roundtrip():
    rng = np.random.default_rng(11)
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (19, 23), dtype=np.uint8)
    for il in (False, True):
        for depth in (4, 8):
            dec = codecs.decode_png(
                codecs.encode_png_palette(idx, plte, depth, interlace=il)
            )
            assert (dec == plte[idx]).all(), (il, depth)
    # out-of-range index guarded
    with pytest.raises(ValueError):
        codecs.encode_png_palette(np.full((2, 2), 4, np.uint8), plte, 2)


def test_png_interlaced_encoder_roundtrip():
    rng = np.random.default_rng(12)
    for shape in ((19, 23), (19, 23, 3), (19, 23, 4), (2, 1)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        dec = codecs.decode_png(codecs.encode_png(img, interlace=True))
        assert dec.shape == img.shape and (dec == img).all(), shape


def test_png_mixed_media_pipeline(spark):
    """The media_png_features driver query path: a heterogeneous batch of
    plain/palette/interlaced PNGs through the auto-sniffing decoder; the
    palette rows quantize to the top nibble so the decoded gray equals
    (img >> 4) * 17 exactly."""
    from bloomine_spark.operators.multimodal import (
        _synthetic_image,
        decode_image_features,
        synthetic_media,
    )

    media = synthetic_media(spark, 12, codec="png-mixed")
    metas = {r["media_id"]: r["meta"]["codec"] for r in media.collect()}
    assert set(metas.values()) == {"png", "png-palette", "png-interlaced"}
    feats = decode_image_features(media, decoder="auto", grid=2).toPandas()
    assert len(feats) == 12
    for _, row in feats.iterrows():
        rid = int(row["media_id"][1:])
        img = _synthetic_image(rid, 42)
        if metas[row["media_id"]] == "png-palette":
            img = ((img >> 4) * 17).astype(np.uint8)
        assert (row["height"], row["width"]) == img.shape
        # grid-pooled means of the exact decoded image
        want = img.astype(np.float64).mean()
        got = np.mean(row["features"])
        assert abs(got - want) < 1.0, (row["media_id"], got, want)


def test_png_16bit_roundtrip_and_jdk_interop():
    """16-bit channels (the last non-exotic PNG decode gap): big-endian
    sample pairs through the shared unfilter path (bpp=2*spp), returned
    as uint16. Roundtrip exact for gray/RGB/RGBA x interlace; the JDK's
    TYPE_USHORT_GRAY fixture (tests/data/jdk_gray16.png, generator
    Gen16.java) decodes pixel-exact."""
    rng = np.random.default_rng(16)
    for shape in ((13, 17), (9, 5, 3), (7, 11, 4)):
        img = rng.integers(0, 65536, shape, dtype=np.uint16)
        for il in (False, True):
            dec = codecs.decode_png(codecs.encode_png(img, interlace=il))
            assert dec.dtype == np.uint16 and (dec == img).all(), (shape, il)
    src = np.array(
        [[int(v) for v in l.split(",")]
         for l in open(_data("jdk_gray16_src.txt"))],
        dtype=np.uint16,
    )
    dec = codecs.decode_png(open(_data("jdk_gray16.png"), "rb").read())
    assert dec.dtype == np.uint16 and dec.shape == src.shape
    assert (dec == src).all()


def test_gif_roundtrip_and_jdk_interop(tmp_path):
    """GIF87a/89a: our encoder's stream decodes exactly, the JDK's
    TYPE_BYTE_INDEXED GIF fixture (tests/data/jdk_indexed.gif, generator
    GenGif.java) decodes pixel-exact, and the JDK decodes OUR stream back
    to the same pixels — interop in both directions."""
    import subprocess

    rng = np.random.default_rng(7)
    for shape, ncol in (((17, 23), 16), ((5, 7), 4), ((60, 40), 256)):
        plte = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        idx = rng.integers(0, ncol, shape, dtype=np.uint8)
        dec = codecs.decode_gif(codecs.encode_gif(idx, plte))
        assert (dec == plte[idx]).all(), (shape, ncol)

    rgb = np.array(
        [[[int(v) for v in px.split(",")] for px in l.strip().split(";")]
         for l in open(_data("jdk_indexed_gif_rgb.txt"))],
        dtype=np.uint8,
    )
    dec = codecs.decode_gif(open(_data("jdk_indexed.gif"), "rb").read())
    assert dec.shape == rgb.shape and (dec == rgb).all()

    # reverse direction: javac a minimal ImageIO reader at test time
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (11, 13), dtype=np.uint8)
    ours = tmp_path / "ours.gif"
    ours.write_bytes(codecs.encode_gif(idx, plte))
    src = (
        "import javax.imageio.ImageIO;import java.awt.image.BufferedImage;"
        "import java.io.File;public class DecG{public static void main"
        "(String[] a)throws Exception{BufferedImage i=ImageIO.read(new "
        "File(a[0]));StringBuilder s=new StringBuilder();for(int y=0;"
        "y<i.getHeight();y++)for(int x=0;x<i.getWidth();x++){int v="
        "i.getRGB(x,y);s.append(((v>>16)&255)+\",\"+((v>>8)&255)+\",\""
        "+(v&255)+\"\\n\");}System.out.print(s);}}"
    )
    (tmp_path / "DecG.java").write_text(src)
    subprocess.run(["javac", "DecG.java"], cwd=tmp_path, check=True,
                   capture_output=True)
    r = subprocess.run(["java", "DecG", str(ours)], cwd=tmp_path,
                       check=True, capture_output=True, text=True)
    px = np.array(
        [[int(v) for v in l.split(",")] for l in r.stdout.strip().split("\n")],
        dtype=np.uint8,
    ).reshape(11, 13, 3)
    assert (px == plte[idx]).all()


def test_gif_interlaced_decode():
    """4-pass GIF interlace: pack rows in pass order ourselves (the
    encoder writes sequential), set the interlace flag, decode must
    un-weave back to the source."""
    import struct as st

    rng = np.random.default_rng(8)
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (23, 9), dtype=np.uint8)
    base = codecs.encode_gif(idx, plte)
    h, w = idx.shape
    rows = np.concatenate(
        [np.arange(s0, h, st0) for s0, st0 in ((0, 8), (4, 8), (2, 4), (1, 2))]
    )
    woven = idx[rows]
    # rebuild: header+GCT from base, new image descriptor w/ interlace bit
    gct_end = 13 + 3 * 16
    out = bytearray(base[:gct_end])
    out += b"\x2c" + st.pack("<HHHHB", 0, 0, w, h, 0x40)
    mcs = 4
    out.append(mcs)
    payload = codecs._gif_lzw_encode(woven.ravel(), mcs)
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    dec = codecs.decode_gif(bytes(out))
    assert (dec == plte[idx]).all()


def test_gif_multiframe_transparency_disposal():
    """Animated GIF compositing: frame 2 is a sub-rect with a transparent
    index (shows frame 1 through) and disposal=2 (restore background
    after), so frame 3 sees the rect cleared."""
    import struct as st

    plte = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]],
                    dtype=np.uint8)
    f1 = np.zeros((8, 8), dtype=np.uint8)
    f1[:] = 1
    base = bytearray(codecs.encode_gif(f1, plte))
    assert base[-2:] == b"\x00\x3b"
    body = bytearray(base[:-1])  # drop trailer, keep first frame

    # frame 2: 4x4 rect at (2,2), color 2 except a transparent hole
    f2 = np.full((4, 4), 2, dtype=np.uint8)
    f2[1, 1] = 3  # transparent index
    body += bytes([0x21, 0xF9, 4, (2 << 2) | 1, 0, 0, 3, 0])  # disposal=2
    body += b"\x2c" + st.pack("<HHHHB", 2, 2, 4, 4, 0)
    body.append(2)
    payload = codecs._gif_lzw_encode(f2.ravel(), 2)
    body.append(len(payload))
    body += payload + b"\x00"
    # frame 3: full-frame transparent (reveals post-disposal canvas)
    f3 = np.full((8, 8), 3, dtype=np.uint8)
    body += bytes([0x21, 0xF9, 4, 1, 0, 0, 3, 0])
    body += b"\x2c" + st.pack("<HHHHB", 0, 0, 8, 8, 0)
    body.append(2)
    payload = codecs._gif_lzw_encode(f3.ravel(), 2)
    body.append(len(payload))
    body += payload + b"\x00\x3b"

    frames = codecs.gif_frames(bytes(body))
    assert len(frames) == 3
    assert (frames[0][:, :, :3] == plte[1]).all()
    # frame 2: rect painted except the hole, which shows frame 1's red
    assert (frames[1][3, 3, :3] == plte[1]).all()
    assert (frames[1][2, 2, :3] == plte[2]).all()
    assert (frames[1][0, 0, :3] == plte[1]).all()
    # frame 3: disposal=2 cleared the rect (alpha 0 there), rest shows red
    assert (frames[2][0, 0, :3] == plte[1]).all()
    assert frames[2][3, 3, 3] == 0  # cleared by disposal, transparent f3
    assert (frames[2][7, 7, :3] == plte[1]).all()


def test_gif_media_pipeline(spark):
    from bloomine_spark.operators.multimodal import (
        _synthetic_image,
        decode_image_features,
        synthetic_media,
    )

    media = synthetic_media(spark, 8, codec="gif")
    feats = decode_image_features(media, decoder="auto", grid=2).toPandas()
    assert len(feats) == 8
    for _, row in feats.iterrows():
        rid = int(row["media_id"][1:])
        img = ((_synthetic_image(rid, 42) >> 4) * 17).astype(np.uint8)
        assert (row["height"], row["width"]) == img.shape
        assert abs(np.mean(row["features"]) - img.mean()) < 1.0


def test_gif_animation_frame_sampling_pipeline(spark):
    """Animated GIFs as a video source: sample_video_frames(decoder='auto')
    mixes RFV1 clips and animated GIFs in one batch, composites GIF frames
    disposal-aware, re-encodes sampled frames as PNG, and the downstream
    feature kernel consumes them format-agnostically."""
    import pandas as pd
    from pyspark.sql import functions as F

    from bloomine_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_image_features,
        sample_video_frames,
    )

    rng = np.random.default_rng(6)
    plte = np.repeat((np.arange(16, dtype=np.uint8) * 17)[:, None], 3, axis=1)
    gif_src = [rng.integers(0, 16, (9, 12), dtype=np.uint8) for _ in range(7)]
    gif_payload = codecs.encode_gif_animation(gif_src, plte)
    rfv_frames = [
        codecs.encode_png(rng.integers(0, 256, (9, 12), dtype=np.uint8))
        for _ in range(7)
    ]
    rfv_payload = codecs.encode_frames(rfv_frames)
    media = spark.createDataFrame(
        pd.DataFrame([
            {"media_id": "g0", "media_type": "video",
             "payload": gif_payload, "meta": {}},
            {"media_id": "v0", "media_type": "video",
             "payload": rfv_payload, "meta": {}},
        ]),
        schema=MEDIA_SCHEMA,
    )
    sampled = sample_video_frames(media, every_n=3, decoder="auto")
    pdf = sampled.toPandas()
    assert sorted(pdf["frame_idx"]) == [0, 0, 3, 3, 6, 6]
    # sampled GIF frames decode to the composited source pixels
    g3 = bytes(pdf[(pdf.media_id == "g0") & (pdf.frame_idx == 3)]
               ["frame"].iloc[0])
    assert (codecs.decode_png(g3) == plte[gif_src[3]]).all()
    # and the whole sampled set feeds the image-feature kernel
    frames_media = sampled.select(
        F.col("media_id"), F.lit("image").alias("media_type"),
        F.col("frame").alias("payload"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )
    feats = decode_image_features(frames_media, decoder="auto", grid=2)
    assert feats.count() == 6
