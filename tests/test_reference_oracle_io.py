"""Differential tests vs the reference's `util/io.py` as oracle.

Completes the reference-oracle matrix for the IO layer by importing the
ACTUAL reference code at /root/reference and asserting cross-readability
and head-to-head equality (`/root/reference/util/io.py:1-81`):

  * every store_* here is loadable by the reference load_* (and vice
    versa) with identical payloads — json, gz json, pickle, text;
  * text loading applies the same strip-and-drop-blank-lines rule;
  * encode_png produces base64 the reference decode_png inverts exactly
    (and our decode_png inverts the reference's encode_png);
  * parse_time agrees on SS / MM:SS / HH:MM:SS forms, fuzzed.

The deliberate difference (QUIRKS-free): our store_* writes via an
atomic replace-into-temp, which is invisible to readers.
"""

import os
import sys

import numpy as np
import pytest

REF = '/root/reference'
if not os.path.isdir(REF):
    pytest.skip('reference tree not available', allow_module_level=True)
pytest.importorskip('PIL')

if REF not in sys.path:
    sys.path.append(REF)  # append: never shadows repo/test modules

from util import io as ref_io  # noqa: E402

from vpd_tpu.core import io as our_io  # noqa: E402


PAYLOAD = {'a': [1, 2.5, None, 'x'], 'nested': {'k': [True, False]},
           'unicode': 'café'}


def test_json_cross_readable(tmp_path):
    ours = str(tmp_path / 'ours.json')
    theirs = str(tmp_path / 'theirs.json')
    our_io.store_json(ours, PAYLOAD)
    ref_io.store_json(theirs, PAYLOAD)
    assert ref_io.load_json(ours) == PAYLOAD
    assert our_io.load_json(theirs) == PAYLOAD
    with open(ours) as f1, open(theirs) as f2:
        assert f1.read() == f2.read()


def test_gz_json_cross_readable(tmp_path):
    ours = str(tmp_path / 'ours.json.gz')
    theirs = str(tmp_path / 'theirs.json.gz')
    our_io.store_gz_json(ours, PAYLOAD)
    ref_io.store_gz_json(theirs, PAYLOAD)
    assert ref_io.load_gz_json(ours) == PAYLOAD
    assert our_io.load_gz_json(theirs) == PAYLOAD


def test_pickle_cross_readable(tmp_path):
    obj = [(7, np.arange(12, dtype=np.float32).reshape(3, 4),
            {'meta': 'm'})]
    ours = str(tmp_path / 'ours.pkl')
    theirs = str(tmp_path / 'theirs.pkl')
    our_io.store_pickle(ours, obj)
    ref_io.store_pickle(theirs, obj)
    for loaded in (ref_io.load_pickle(ours), our_io.load_pickle(theirs)):
        assert loaded[0][0] == 7 and loaded[0][2] == {'meta': 'm'}
        np.testing.assert_array_equal(loaded[0][1], obj[0][1])


def test_text_round_trip_and_blank_line_rule(tmp_path):
    raw = 'first\n\n  second  \n\t\nthird\n'
    ours = str(tmp_path / 'ours.txt')
    theirs = str(tmp_path / 'theirs.txt')
    our_io.store_text(ours, raw)
    ref_io.store_text(theirs, raw)
    with open(ours) as f1, open(theirs) as f2:
        assert f1.read() == f2.read()
    assert our_io.load_text(theirs) == ref_io.load_text(ours)
    assert ref_io.load_text(ours) == ['first', 'second', 'third']


def test_png_base64_cross_invertible():
    rng = np.random.default_rng(0)
    for shape in [(17, 23, 3), (8, 8)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        np.testing.assert_array_equal(
            ref_io.decode_png(our_io.encode_png(img)), img)
        np.testing.assert_array_equal(
            our_io.decode_png(ref_io.encode_png(img)), img)
        # identical base64 text, not merely invertible
        assert our_io.encode_png(img) == ref_io.encode_png(img)


def test_decode_png_accepts_raw_bytes():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    b64 = ref_io.encode_png(img)
    import base64
    raw = base64.decodebytes(b64.encode())
    np.testing.assert_array_equal(our_io.decode_png(raw),
                                  ref_io.decode_png(raw))


def test_parse_time_oracle():
    rng = np.random.default_rng(1)
    cases = ['5', '5.25', '0:30', '12:05.5', '1:02:03.75', '00:00:00']
    for _ in range(50):
        h, m = rng.integers(0, 3), rng.integers(0, 60)
        s = float(np.round(rng.uniform(0, 60), 3))
        cases.append('{}:{:02d}:{:06.3f}'.format(h, m, s))
        cases.append('{}:{:06.3f}'.format(m, s))
    for t in cases:
        assert our_io.parse_time(t) == ref_io.parse_time(t), t
