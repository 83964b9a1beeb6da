"""Self-contained TFRecord/Example codec vs TensorFlow (golden interop).

The framework stores datasets in the reference's TFRecord/tf.Example format
but reads/writes it with data/tfrecord_codec.py (no TF). TF here is ONLY
the test oracle proving byte-compatibility in both directions.
"""

import numpy as np
import pytest

from detectron2_tensorflow_tpu.data import tfrecord_codec as codec

tf = pytest.importorskip("tensorflow")


def _example_bytes():
    feats = {
        "image/encoded": codec.bytes_feature([b"\x00\xffjpeg-payload"]),
        "image/object/bbox/xmin": codec.float_feature([0.0, 0.25, 0.875]),
        "image/object/class/label": codec.int64_feature([7, 0, -3, 1 << 40]),
        "image/source_id": codec.bytes_feature([b"42"]),
    }
    return feats, codec.encode_example(feats)


def test_crc32c_known_answer():
    # RFC 3720 check value
    assert codec.crc32c(b"123456789") == 0xE3069283
    # native path (when available) and the pure-python table must agree
    big = bytes(np.random.default_rng(0).integers(0, 256, 100000, np.uint8))
    table = codec._crc_table()
    crc = 0xFFFFFFFF
    for b in big:
        crc = (crc >> 8) ^ int(table[(crc ^ b) & 0xFF])
    assert codec.crc32c(big) == crc ^ 0xFFFFFFFF


def test_tf_parses_codec_example():
    feats, enc = _example_bytes()
    ex = tf.train.Example()
    ex.ParseFromString(enc)
    f = ex.features.feature
    assert list(f["image/encoded"].bytes_list.value) == [b"\x00\xffjpeg-payload"]
    np.testing.assert_allclose(
        list(f["image/object/bbox/xmin"].float_list.value),
        [0.0, 0.25, 0.875],
    )
    assert list(f["image/object/class/label"].int64_list.value) == [
        7, 0, -3, 1 << 40,
    ]


def test_codec_parses_tf_example():
    _, enc = _example_bytes()
    ex = tf.train.Example()
    ex.ParseFromString(enc)
    dec = codec.decode_example(ex.SerializeToString())
    assert dec["image/encoded"][1] == [b"\x00\xffjpeg-payload"]
    np.testing.assert_allclose(
        dec["image/object/bbox/xmin"][1], [0.0, 0.25, 0.875]
    )
    assert dec["image/object/class/label"][1].tolist() == [7, 0, -3, 1 << 40]


def test_tfrecord_framing_interop(tmp_path):
    _, enc = _example_bytes()
    ours = tmp_path / "ours.record"
    with open(ours, "wb") as fh:
        codec.write_record(fh, b"alpha")
        codec.write_record(fh, enc)
    got = list(tf.data.TFRecordDataset(str(ours)).as_numpy_iterator())
    assert got == [b"alpha", enc]

    theirs = tmp_path / "theirs.record"
    with tf.io.TFRecordWriter(str(theirs)) as w:
        w.write(b"beta")
        w.write(enc)
    assert list(codec.read_records(str(theirs))) == [b"beta", enc]
    # lazy index + random access
    idx = codec.index_records(str(theirs))
    assert len(idx) == 2
    assert codec.read_record_at(str(theirs), *idx[1], verify=True) == enc


def test_crc_verification_detects_corruption(tmp_path):
    p = tmp_path / "c.record"
    with open(p, "wb") as fh:
        codec.write_record(fh, b"payload-payload")
    raw = bytearray(p.read_bytes())
    raw[14] ^= 0x40  # flip a payload bit
    p.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="crc"):
        list(codec.read_records(str(p)))
