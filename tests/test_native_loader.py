"""Native C data loader: parity with the NumPy fallback.

The C extension (physher_tpu/native/loader.c) re-expresses the reference's
data layer hot paths (reference: src/phyc/sequenceio.c FASTA reader,
src/phyc/sitepattern.c:87-185 pattern compression); these tests pin
bit-identical behavior between the ctypes binding and pure NumPy.
"""

import os

import numpy as np
import pytest

from physher_tpu import native
from physher_tpu.data.datatype import get_datatype
from physher_tpu.data.sitepattern import SitePattern
from physher_tpu.io.seqio import read_fasta

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def flua_text():
    with open(os.path.join(DATA, "fluA.fa")) as fh:
        return fh.read()


def test_native_builds():
    assert native.available(), "C toolchain present in image; must compile"


def test_fasta_parse_matches_python(flua_text):
    dt = get_datatype("nucleotide")
    table = dt.code_table()
    names, enc = native.parse_fasta_encoded(flua_text, table)
    seqs = read_fasta(flua_text)
    assert names == list(seqs)
    assert enc.shape == (69, 987)
    ref = np.stack([dt.encode_sequence(seqs[n]) for n in names])
    np.testing.assert_array_equal(enc, ref.astype(np.uint8))


def test_compression_matches_numpy(flua_text):
    dt = get_datatype("nucleotide")
    table = dt.code_table()
    _, enc = native.parse_fasta_encoded(flua_text, table)
    codes, weights, indexes = native.compress_patterns(enc)
    assert codes.shape == (69, 238)          # known fluA pattern count
    assert weights.sum() == 987.0
    # round-trip: expanding patterns by indexes reproduces the alignment
    np.testing.assert_array_equal(codes[:, indexes], enc)
    # first-occurrence order matches SitePattern.compress
    sp = SitePattern.from_alignment(read_fasta(flua_text))
    np.testing.assert_array_equal(sp.codes, codes.astype(np.int32))
    np.testing.assert_array_equal(sp.weights, weights)
    np.testing.assert_array_equal(sp.indexes, indexes)


def test_code_table_roundtrip():
    dt = get_datatype("nucleotide")
    table = dt.code_table()
    assert table is not None
    for ch in "ACGTacgtRYMKSWN-?":
        assert table[ord(ch)] == dt.encode(ch)


def test_encode_sequence_native_path():
    dt = get_datatype("aa")
    seq = "ARNDCQEGHILKMFPSTWYVX-?"
    enc = dt.encode_sequence(seq)
    ref = np.array([dt.encode(c) for c in seq], dtype=np.int32)
    np.testing.assert_array_equal(enc, ref)
