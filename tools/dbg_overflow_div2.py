"""Compare batched cycle with shrunk pool vs batched with default pool:
both use the identical scoring programs, so the first divergent trace
line localizes a segmentation bug (not f32 path noise)."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from dbg_overflow_div import diff, one_cycle  # noqa: E402

if __name__ == '__main__':
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    a = one_cycle(True, n)
    b = one_cycle(True, None)
    diff(a, b, f'pool{n}', 'default')
