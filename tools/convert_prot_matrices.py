"""One-time conversion of the dumped empirical AA matrices into
examl_tpu/models/data/prot_matrices.npz.

The matrices themselves are published scientific data (Dayhoff 1978, WAG,
LG, LG4M/LG4X, ...); the dump comes from tools in .refbuild (reference
models.c initProtMat, examl/models.c:225-3060).
"""
import sys

import numpy as np

def main(txt_path, out_path):
    mats = {}
    with open(txt_path) as fh:
        lines = [l.strip() for l in fh if l.strip()]
    i = 0
    while i < len(lines):
        assert lines[i].startswith('MATRIX')
        _, name, mid, lg4 = lines[i].split()
        freqs = np.array([float(x) for x in lines[i + 1].split()[1:]])
        rates = np.array([float(x) for x in lines[i + 2].split()[1:]])
        assert freqs.shape == (20,) and rates.shape == (190,)
        key = name if name not in ('LG4M', 'LG4X') else f'{name}_{lg4}'
        mats[f'{key}_freqs'] = freqs
        mats[f'{key}_rates'] = rates
        i += 3
    np.savez_compressed(out_path, **mats)
    print(f'wrote {len(mats)//2} matrices to {out_path}')

if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2])
