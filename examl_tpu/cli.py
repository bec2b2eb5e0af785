"""Command-line interface.

Two subcommands mirroring the reference executables (reference:
examl/axml.c get_args :935 / main :2573, parser/axml.c main :2689):

  examl-tpu parse  -s alignment -q partitionFile -m DNA|PROT|BIN -n name
  examl-tpu run    -s bytefile  -t startingTree -n name
                   [-m GAMMA|PSR] [-f d|e|E] [-e eps] [-i radius] [-D] [-M]
                   [-a] [-B n] [-w workdir] [--auto-prot=ml|bic|aic|aicc]

Outputs mirror the reference artifacts: ExaML_info.NAME (run log),
ExaML_result.NAME (best tree), ExaML_log.NAME ((seconds, lnL) series),
ExaML_modelFile.NAME (fitted parameters).
"""
from __future__ import annotations

import argparse
import math
import os
import sys
import time


def _info(path, msg):
    print(msg, end='')
    with open(path, 'a') as fh:
        fh.write(msg)


def cmd_parse(args):
    from .io.bytefile import write_bytefile
    from .io.phylip import parse_phylip

    aln = parse_phylip(args.s, args.q, compress=not args.no_compression)
    out = f'{args.n}.binary'
    write_bytefile(out, aln)
    print(f'Alignment has {aln.n_patterns} unique patterns')
    print(f'gappyness: {aln.gappyness:f}')

    # CLV memory estimate (the reference parser prints the same numbers,
    # parser/axml.c:2846-2884); under GAMMA it is 4x the CAT figure
    clv_cat = sum(p.states * p.width for p in aln.partitions) \
        * aln.n_taxa * 8
    tips = aln.n_taxa * aln.n_patterns
    print(f'CLV memory (CAT, f64): {clv_cat + tips:,} bytes; '
          f'GAMMA: {4 * clv_cat + tips:,} bytes '
          f'({(4 * clv_cat + tips) / 2**30:.2f} GiB); '
          f'f32 engine halves this. Site-shard across a device mesh '
          f'when it exceeds per-chip HBM.')
    print(f'Binary and compressed alignment file written to file {out}')
    return 0


_AA_NAMES = ['A', 'R', 'N', 'D', 'C', 'Q', 'E', 'G', 'H', 'I', 'L', 'K',
             'M', 'F', 'P', 'S', 'T', 'W', 'Y', 'V']


def _rate_lines(names, rates):
    """Pairwise exchangeability lines (axml.c printRatesDNA_BIN /
    printRatesRest :1650-1700)."""
    lines = []
    k = 0
    n = len(names)
    for i in range(n - 1):
        for j in range(i + 1, n):
            lines.append(f'rate {names[i]} <-> {names[j]}: {rates[k]:f}\n')
            k += 1
    return lines


def _tree_length(engine, col):
    """Sum of branch lengths in expected substitutions per site
    (treeIO.c treeLength; EIGN is fracchange-normalized so the length of a
    branch is -log(z))."""
    from .constants import ZMIN
    total = 0.0
    for p in engine.tree.branches():
        total += -math.log(max(p.z[col], ZMIN))
    return total


def _print_model_params(engine, path):
    """ExaML_modelFile content (reference printModelParams,
    axml.c:1733-1835): per partition the alpha, tree length,
    exchangeability rates and frequencies; LG4M/LG4X additionally dump the
    four per-category matrices, and LG4X its fitted rates/weights."""
    from .datatypes import DataType, ProtModel
    from .models.protein import prot_rates_freqs
    lines = []
    for m, pm in enumerate(engine.partitions):
        col = m if engine.num_branches > 1 else 0
        lines.append('\n\n')
        lines.append(f'Model Parameters of Partition {m}, Name: {pm.name}, '
                     f'Type of Data: {pm.data_type.name}\n')
        if not engine.is_psr:
            lines.append(f'alpha: {pm.alpha:f}\n')
        lines.append(f'Tree-Length: {_tree_length(engine, col):f}\n')

        if pm.data_type == DataType.AA:
            model = (pm.auto_prot_model if pm.prot_model == ProtModel.AUTO
                     else pm.prot_model)
            lines.append(f'Substitution Matrix: {model.name}\n')
            if pm.prot_model in (ProtModel.LG4M, ProtModel.LG4X):
                if pm.prot_model == ProtModel.LG4X:
                    for k in range(4):
                        lines.append(f'LG4X rate {k}: '
                                     f'{pm.gamma_rates[k]:f} weight {k}: '
                                     f'{pm.lg4x_weights[k]:f}\n')
                for k in range(4):
                    rates_k, freqs_k = prot_rates_freqs(pm.prot_model, k)
                    lines.append(f'LGM {k}\n')
                    lines += _rate_lines(_AA_NAMES, rates_k)
                    lines.append('\n')
                    for nm, f in zip(_AA_NAMES, freqs_k):
                        lines.append(f'freq pi({nm}): {f:f}\n')
            lines += _rate_lines(_AA_NAMES, pm.subst_rates)
            lines.append('\n')
            for nm, f in zip(_AA_NAMES, pm.frequencies):
                lines.append(f'freq pi({nm}): {f:f}\n')
        elif pm.data_type == DataType.DNA:
            lines += _rate_lines('ACGT', pm.subst_rates)
            lines.append('\n')
            for base, f in zip('ACGT', pm.frequencies):
                lines.append(f'freq pi({base}): {f:f}\n')
        else:                                   # binary / multi-state
            names = [str(i) for i in range(pm.states)]
            lines += _rate_lines(names, pm.subst_rates)
            lines.append('\n')
            for nm, f in zip(names, pm.frequencies):
                lines.append(f'freq pi({nm}): {f:f}\n')
        lines.append('\n')
    lines.append('\n')
    with open(path, 'w') as fh:
        fh.writelines(lines)


def _print_aa_gtr_matrix(engine, workdir, run_id, epsilon):
    """Intermediate AA-GTR matrix dump (optimizeModel.c printAAmatrix
    :2533-2600): full symmetric 20x20 Q + frequencies, one file per
    optimization epsilon."""
    from .datatypes import DataType, ProtModel
    import numpy as np
    for pm in engine.partitions:
        if (pm.data_type == DataType.AA
                and pm.prot_model == ProtModel.GTR):
            q = np.zeros((20, 20))
            k = 0
            for i in range(19):
                for j in range(i + 1, 20):
                    q[i, j] = q[j, i] = pm.subst_rates[k]
                    k += 1
            path = os.path.join(
                workdir, f'ExaML_proteinGTRmodel.{run_id}_{epsilon:f}')
            with open(path, 'w') as fh:
                for i in range(20):
                    fh.write(' '.join(f'{q[i, j]:1.80f}'
                                      for j in range(20)) + ' \n')
                fh.write(' '.join(f'{f:1.80f}'
                                  for f in pm.frequencies) + ' \n')
            return path
    return None


def cmd_run(args):
    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    if args.f64:
        jax.config.update('jax_enable_x64', True)
    if args.distributed:
        # MPI_Init analogue (axml.c:2575); coordinator/process-id come
        # from the EXAML_TPU_* env vars or cluster autodetection
        from .parallel.distributed import initialize
        initialize()
    if jax.default_backend() not in ('cpu',):
        # persist compiled executables; the remote-compile path is slow
        cache = os.path.join(os.path.expanduser('~'), '.examl_tpu_cache')
        os.makedirs(cache, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)

    from .io.bytefile import read_bytefile
    from .run import run_search, run_tree_evaluation

    workdir = args.w or os.getcwd()
    info_path = os.path.join(workdir, f'ExaML_info.{args.n}')
    result_path = os.path.join(workdir, f'ExaML_result.{args.n}')
    log_path = os.path.join(workdir, f'ExaML_log.{args.n}')
    model_path = os.path.join(workdir, f'ExaML_modelFile.{args.n}')
    open(info_path, 'w').close()

    aln = read_bytefile(args.s)
    tree_newick = open(args.t).read()

    _info(info_path, f'examl-tpu analysis name: {args.n}\n')
    _info(info_path, f'{aln.n_taxa} taxa, {aln.n_patterns} patterns, '
                     f'{len(aln.partitions)} partitions\n\n')
    # startup data-distribution table (partitionAssignment.c
    # printAssignments/printLoad :461-502): Kassian layout at process
    # granularity; on-device the site axes are sharded uniformly (see
    # parallel/distributed.py for the rationale)
    from .parallel.distributed import load_balance_table
    n_procs = max(jax.process_count(), 1)
    _info(info_path, load_balance_table(aln, n_procs) + '\n')

    t0 = time.time()
    kwargs = dict(num_branches=(len(aln.partitions) if args.M else 1),
                  use_median=args.a,
                  rate_het=('PSR' if args.m == 'PSR' else 'GAMMA'),
                  max_categories=args.c)
    if args.S:
        if args.f not in ('e', 'E'):
            raise SystemExit(
                '-S (induced-subtree CLV compaction) currently supports '
                'the tree-evaluation modes -f e/E only; run the search '
                'without -S (site/member sharding covers capacity there, '
                'docs/SEV.md)')
        kwargs['compact'] = True
        _info(info_path, 'Induced-subtree CLV compaction (-S): model '
                         'optimization at FIXED branch lengths\n')
    if args.stack != 'auto':
        kwargs['stack'] = args.stack == 'on'
    if args.devices != 1:
        # site-shard every per-site buffer over an N-device 'sites' mesh
        # (the reference's rank parallelism, partitionAssignment.c; psum
        # rides the ICI instead of MPI_Allreduce). 0 = all visible devices.
        import numpy as np
        from jax.sharding import Mesh
        devs = jax.devices()
        n = args.devices or len(devs)
        if n > len(devs):
            raise SystemExit(f'--devices {n}: only {len(devs)} visible '
                             f'(use --distributed / XLA_FLAGS='
                             f'--xla_force_host_platform_device_count=N)')
        if n > 1:
            kwargs['sharding'] = Mesh(np.array(devs[:n]), ('sites',))
            _info(info_path, f'Device mesh: {n} device(s) over the sites '
                             f'axis\n')
    run_extra = dict(auto_prot_selection=args.auto_prot)

    import contextlib
    profile_cm = (jax.profiler.trace(args.profile)
                  if args.profile else contextlib.nullcontext())
    with profile_cm:
        return _run_analysis(args, aln, tree_newick, kwargs, workdir,
                             info_path, result_path, log_path, model_path,
                             t0)


def _run_analysis(args, aln, tree_newick, kwargs, workdir, info_path,
                  result_path, log_path, model_path, t0):
    from .run import run_search, run_tree_evaluation
    run_extra = dict(auto_prot_selection=args.auto_prot)

    ckp_common = dict(checkpoint_run_id=(args.n if args.R else None),
                      resume_from_checkpoint=args.R,
                      checkpoint_workdir=workdir)

    if args.f == 'q':
        from .run import run_quartets
        quart_path = os.path.join(workdir, f'ExaML_quartets.{args.n}')
        results = run_quartets(
            aln, tree_newick,
            n_random=(args.r or None), grouping_file=args.Y,
            random_seed=args.p, likelihood_epsilon=args.e,
            out_path=quart_path, checkpoint_interval=args.I,
            **ckp_common, **kwargs)
        _info(info_path, f'\n{len(results)} quartet trees evaluated, '
                         f'written to {quart_path}\n')
        return 0

    if args.f in ('e', 'E'):
        res = run_tree_evaluation(aln, tree_newick,
                                  likelihood_epsilon=args.e,
                                  fast=(args.f == 'E'), **run_extra,
                                  **ckp_common, **kwargs)
        with open(os.path.join(workdir, f'ExaML_TreeFile.{args.n}'),
                  'w') as fh:
            for lnl, nwk in res.best_trees:
                _info(info_path, f'Likelihood tree: {lnl:f}\n')
                fh.write(nwk + '\n')
    else:
        constraint_newick = open(args.g).read() if args.g else None
        res = run_search(aln, tree_newick, **run_extra,
                         initial_radius=args.i,
                         search_convergence=args.D,
                         save_best_trees=args.B,
                         constraint_newick=constraint_newick,
                         random_seed=args.p,
                         # -f o: same search without the lnL cutoff
                         # heuristic (axml.c:1143-1145 doCutoff = FALSE)
                         do_cutoff=(args.f != 'o'),
                         verbose=True, **ckp_common, **kwargs)
        if res.best_trees:
            good_path = os.path.join(workdir,
                                     f'ExaML_goodTrees.{args.n}')
            with open(good_path, 'w') as fh:
                for lnl, nwk in res.best_trees:
                    fh.write(nwk + '\n')
        with open(log_path, 'w') as fh:
            for sec, lnl in res.log:
                fh.write(f'{sec:f} {lnl:f}\n')

    with open(result_path, 'w') as fh:
        fh.write(res.tree_newick + '\n')
    _print_model_params(res.engine, model_path)
    gtr_path = _print_aa_gtr_matrix(res.engine, workdir, args.n, args.e)
    if gtr_path:
        _info(info_path, '\nPrinted intermediate AA substitution matrix '
                         f'to file {gtr_path}\n')

    _info(info_path,
          f'\nLikelihood of best tree: {res.likelihood:f}\n'
          f'Overall Time for 1 Inference {time.time() - t0:f}\n'
          f'Final tree written to: {result_path}\n')
    if args.op_stats:
        counts = {k: v for k, v in res.engine.op_stats.items()
                  if not k.startswith('compile:')}
        stats = sorted(counts.items(), key=lambda kv: -kv[1])
        total = sum(counts.values())
        print(f'host-sync operations: {total} total')
        for k, v in stats:
            print(f'  {k:32s} {v}')
        times = sorted(res.engine.op_time.items(), key=lambda kv: -kv[1])
        total_t = sum(res.engine.op_time.values())
        print(f'host-blocked time: {total_t:.1f}s '
              f'(compile:* = trace+XLA compile, sync:* = value fetches)')
        for k, v in times:
            n = res.engine.op_stats.get(
                k if k.startswith('compile:') else k[len('sync:'):], 0)
            print(f'  {k:40s} {v:8.1f}s  ({n}x)')
    return 0


def main(argv=None):
    parser = argparse.ArgumentParser(prog='examl-tpu')
    # -v/--version (reference axml.c case 'v' -> printVersionInfo :900)
    parser.add_argument('-v', '--version', action='version',
                        version='examl-tpu 0.2 (feature parity target: '
                                'ExaML 3.0.22)')
    sub = parser.add_subparsers(dest='cmd', required=True)

    p = sub.add_parser('parse', help='compile PHYLIP alignment to byte file')
    p.add_argument('-s', required=True, help='PHYLIP alignment')
    p.add_argument('-q', required=True, help='partition model file')
    p.add_argument('-m', default='DNA', help='fallback model (DNA|PROT|BIN)')
    p.add_argument('-n', required=True, help='output name')
    p.add_argument('-c', dest='no_compression', action='store_true',
                   help='disable pattern compression')
    p.set_defaults(fn=cmd_parse)

    r = sub.add_parser('run', help='run inference on a byte file')
    r.add_argument('-s', required=True, help='binary alignment file')
    r.add_argument('-t', required=True, help='starting tree (Newick)')
    r.add_argument('-n', required=True, help='run name')
    r.add_argument('-m', default='GAMMA', choices=['GAMMA', 'PSR'],
                   help='rate heterogeneity model')
    r.add_argument('-f', default='d', choices=['d', 'e', 'E', 'o', 'q'],
                   help='d = ML search, e/E = evaluate fixed trees, '
                        'q = quartets')
    r.add_argument('-r', type=int, default=0,
                   help='number of random quartets (-f q)')
    r.add_argument('-Y', default=None,
                   help='quartet grouping file (-f q)')
    r.add_argument('-I', type=int, default=1000,
                   help='quartet checkpoint interval')
    r.add_argument('-p', type=int, default=12345,
                   help='random number seed (-g / -f q)')
    r.add_argument('-g', default=None,
                   help='multifurcating constraint tree file')
    r.add_argument('-e', type=float, default=0.1,
                   help='likelihood epsilon')
    r.add_argument('-c', type=int, default=25,
                   help='number of PSR rate categories')
    r.add_argument('-i', type=int, default=None,
                   help='initial rearrangement radius')
    r.add_argument('-D', action='store_true',
                   help='RF convergence criterion')
    r.add_argument('-M', action='store_true',
                   help='per-partition branch lengths')
    r.add_argument('-S', action='store_true',
                   help='induced-subtree CLV compaction for block-missing '
                        'multi-gene data (the reference -S/SEV memory '
                        'saving, docs/SEV.md): ~2*present(p) CLV rows '
                        'per partition; -f e/E with fixed branch lengths '
                        'only')
    r.add_argument('-a', action='store_true', help='median gamma')
    r.add_argument('-B', type=int, default=0, help='save N best ML trees')
    r.add_argument('-R', action='store_true',
                   help='resume from the latest checkpoint for this run name')
    r.add_argument('-w', default=None, help='output directory')
    r.add_argument('--auto-prot', default='ml',
                   choices=['ml', 'bic', 'aic', 'aicc'])
    r.add_argument('--platform', default=None,
                   help='jax platform override (cpu|axon|tpu)')
    r.add_argument('--devices', type=int, default=1, metavar='N',
                   help='site-shard over an N-device mesh (0 = all '
                        'visible devices; default 1 = no mesh)')
    r.add_argument('--distributed', action='store_true',
                   help='join the multi-process jax.distributed runtime '
                        '(coordinator from EXAML_TPU_COORDINATOR / '
                        'cluster autodetection) before building the mesh')
    r.add_argument('--stack', choices=('auto', 'on', 'off'),
                   default='auto',
                   help='partition-geometry stacking: one kernel launch '
                        'per group of same-geometry partitions '
                        '(docs/STACKING.md); auto = on wherever the '
                        'Pallas path runs (hardware-validated)')
    r.add_argument('--f64', action='store_true',
                   help='double-precision likelihood arithmetic')
    r.add_argument('--op-stats', dest='op_stats', action='store_true',
                   help='print host-sync operation counts at the end '
                        '(each is one device round trip)')
    r.add_argument('--profile', default=None, metavar='DIR',
                   help='write a JAX profiler trace to DIR')
    r.set_defaults(fn=cmd_run)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == '__main__':
    sys.exit(main())
