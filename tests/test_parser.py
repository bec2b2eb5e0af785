"""The standalone PHYLIP parser must produce byte-identical compressed
alignments to the reference parse-examl (patterns, weights, layout,
empirical frequencies) on both bundled datasets."""
import pathlib

import numpy as np
import pytest

from examl_tpu.io.bytefile import read_bytefile, write_bytefile
from examl_tpu.io.phylip import parse_phylip

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path(__file__).resolve().parent / 'data'


@pytest.mark.parametrize('name,model', [('49', '49.model'),
                                        ('140', '140.model')])
def test_parser_matches_reference_bytefile(name, model):
    mine = parse_phylip(str(REF / name), str(REF / model))
    ref = read_bytefile(str(DATA / f'{name}.binary'))
    assert mine.n_patterns == ref.n_patterns
    assert np.array_equal(mine.weights, ref.weights)
    assert np.array_equal(mine.codes, ref.codes)
    assert mine.taxon_names == ref.taxon_names
    assert mine.gappyness == pytest.approx(ref.gappyness, abs=1e-12)
    for pm, pr in zip(mine.partitions, ref.partitions):
        assert (pm.name, pm.lower, pm.upper) == (pr.name, pr.lower, pr.upper)
        assert int(pm.data_type) == int(pr.data_type)
        assert int(pm.prot_model) == int(pr.prot_model)
        assert np.allclose(pm.frequencies, pr.frequencies, atol=1e-12)


def test_bytefile_roundtrip(tmp_path):
    mine = parse_phylip(str(REF / '49'), str(REF / '49.model'))
    path = tmp_path / 'rt.binary'
    write_bytefile(str(path), mine)
    back = read_bytefile(str(path))
    assert np.array_equal(back.codes, mine.codes)
    assert np.array_equal(back.weights, mine.weights)


@pytest.mark.parametrize('name,model', [('49', '49.model'),
                                        ('140', '140.model')])
def test_writer_bytes_match_parse_examl(name, model, tmp_path):
    """write_bytefile output is byte-identical to the instrumented
    parse-examl build's file (header incl. the programVersionInt 3022
    stamp examl/byteFile.c:119 checks, weights, names, partition records
    incl. the -1 protFreqs initializer for non-AA partitions, codes) —
    except the empirical-frequency doubles, where numpy's pairwise f64
    summation differs from the C loop's sequential order by 1-2 ulp."""
    import struct
    from examl_tpu.io.bytefile import write_bytefile
    mine = parse_phylip(str(REF / name), str(REF / model))
    out = tmp_path / 'w.binary'
    write_bytefile(str(out), mine)
    a = bytearray(out.read_bytes())
    b = bytearray((DATA / f'{name}.binary').read_bytes())
    assert len(a) == len(b)
    # zero the frequency fields in both buffers
    off = 12
    n_taxa, n_pat, n_mod, _ = struct.unpack_from('<iqid', a, off)
    off += 24 + 4 * n_pat
    for _ in range(n_taxa):
        ln = struct.unpack_from('<i', a, off)[0]
        off += 4 + ln
    rec = struct.calcsize('<iiqqqiiiii')
    for _ in range(n_mod):
        states = struct.unpack_from('<i', a, off)[0]
        off += rec
        ln = struct.unpack_from('<i', a, off)[0]
        off += 4 + ln
        for buf in (a, b):
            buf[off:off + 8 * states] = b'\0' * (8 * states)
        off += 8 * states
    assert bytes(a) == bytes(b)


def test_read_bytefile_mmap_equivalence():
    """mmap mode returns identical per-partition codes without
    materializing the full alignment (readMyData slice semantics)."""
    import pathlib
    from examl_tpu.io.bytefile import read_bytefile
    path = str(pathlib.Path(__file__).resolve().parent / 'data' / '49.binary')
    full = read_bytefile(path)
    mm = read_bytefile(path, mmap=True)
    assert mm.codes is None and mm.codes_mm is not None
    assert mm.taxon_names == full.taxon_names
    assert (mm.weights == full.weights).all()
    for m in range(len(full.partitions)):
        import numpy as np
        np.testing.assert_array_equal(
            np.asarray(mm.partition_codes(m)), full.partition_codes(m))
