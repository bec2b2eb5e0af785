"""High-level analysis drivers: the programmatic equivalents of the
reference main() modes (reference: examl/axml.c:2573-2794).

run_tree_evaluation  == -f e (optimize model + branch lengths on fixed trees)
run_search           == -f d (full ML search, computeBIGRAPID)
"""
from __future__ import annotations

import dataclasses
import time
from typing import List, Optional

from .engine import LikelihoodEngine
from .io.bytefile import Alignment, read_bytefile
from .io.newick import parse_newick, write_newick
from .optimize.model_opt import ModelOptimizer
from .search.spr import SprSearch
from .tree import Tree


@dataclasses.dataclass
class RunResult:
    likelihood: float
    tree_newick: str
    engine: LikelihoodEngine
    log: List  # [(seconds, lnL), ...]
    best_trees: List = dataclasses.field(default_factory=list)  # -B output


def result_newick(engine: LikelihoodEngine) -> str:
    """Final-tree Newick with the reference's branch-length convention:
    under -M the printed length is the partition-weight-average of the
    per-class lengths (treeIO.c getBranchLength SUMMARIZE_LH :196)."""
    contributions = None
    if engine.num_branches > 1:
        weights = [pm.partition_weight for pm in engine.partitions]
        total = sum(weights)
        contributions = [w / total for w in weights]
    return write_newick(engine.tree,
                        partition_contributions=contributions)


def _setup(alignment: Alignment, tree_newick: str, **engine_kwargs):
    num_branches = engine_kwargs.get('num_branches', 1)
    tree = Tree(alignment.taxon_names, num_branches=num_branches)
    parse_newick(tree_newick, tree)
    engine = LikelihoodEngine(alignment, tree, **engine_kwargs)
    return engine


def _cmd_signature(mode, engine_kwargs, **params) -> dict:
    """The command-line echo stored in checkpoints for the restart
    compatibility check (checkCommandLineArguments,
    searchAlgo.c:1383-1500)."""
    sig = dict(mode=mode,
               rate_het=engine_kwargs.get('rate_het', 'GAMMA'),
               num_branches=engine_kwargs.get('num_branches', 1),
               use_median=bool(engine_kwargs.get('use_median', False)),
               categories=engine_kwargs.get('max_categories', 25))
    sig.update(params)
    return sig


def run_tree_evaluation(alignment: Alignment, tree_newick: str,
                        likelihood_epsilon: float = 0.1,
                        fast: bool = False,
                        auto_prot_selection: str = 'ml',
                        checkpoint_run_id: Optional[str] = None,
                        checkpoint_workdir: str = '.',
                        resume_from_checkpoint: bool = False,
                        **engine_kwargs) -> RunResult:
    """Evaluate/optimize fixed topologies (reference optimizeTrees :2251).
    tree_newick may contain several ';'-terminated trees (-f e evaluates
    each; -f E = fast only optimizes branch lengths after the first).
    RunResult carries the last tree; .best_trees lists all (lnL, newick).

    With checkpoint_run_id set, a MOD_OPT-phase checkpoint is written at
    every modOpt cycle (optimizeModel.c:3034-3043) carrying the tree index
    and the finished trees' results, so a killed -f e run resumes mid-tree
    (restart dispatch searchAlgo.c:1740-1742)."""
    import json

    import numpy as np

    trees = [t.strip() + ';' for t in tree_newick.split(';') if t.strip()]
    engine = _setup(alignment, trees[0], **engine_kwargs)
    tr = engine.tree
    results = []
    optimizer = ModelOptimizer(engine, auto_prot_selection)

    cmd = _cmd_signature('tree_evaluation', engine_kwargs, fast=fast,
                         epsilon=likelihood_epsilon, n_trees=len(trees),
                         auto_prot=auto_prot_selection)
    ckper = None
    resume_iter = None
    acc0 = 0.0
    if checkpoint_run_id is not None:
        from .checkpoint import (Checkpointer, check_cmd_compatibility)
        ckper = Checkpointer(checkpoint_run_id, workdir=checkpoint_workdir)
        latest = Checkpointer.latest(checkpoint_run_id, checkpoint_workdir)
        if resume_from_checkpoint and latest is not None:
            state, extras = Checkpointer.read(latest, engine)
            check_cmd_compatibility(extras.get('cmd'), cmd)
            resume_iter = int(extras.get('tree_iteration', 0))
            optimizer._cat_opt = state.cat_opt
            acc0 = state.accumulated_time
            done_lnl = np.atleast_1d(extras.get('done_lnl', np.zeros(0)))
            done_nwk = np.atleast_1d(
                extras.get('done_nwk', np.zeros(0, dtype=str)))
            results = [(float(lh), str(nw))
                       for lh, nw in zip(done_lnl, done_nwk)]

    t0 = time.time()
    for i, nwk in enumerate(trees):
        if resume_iter is not None and i < resume_iter:
            continue                      # already recorded in results
        if i > 0 and not (resume_iter is not None and i == resume_iter):
            parse_newick(nwk, tr)
            engine.reset_branches()
        # at i == resume_iter the checkpointed tree/model are already live
        engine.evaluate(tr.start, full_traversal_=True)

        ckp_cb = None
        if ckper is not None:
            from .checkpoint import MOD_OPT, SearchState

            def ckp_cb(i=i):
                st = SearchState(
                    state=MOD_OPT, likelihood=engine.likelihood,
                    accumulated_time=acc0 + (time.time() - t0),
                    tree_iteration=i, cat_opt=optimizer._cat_opt)
                extra = dict(
                    cmd=json.dumps(cmd), tree_iteration=i,
                    done_lnl=np.array([lh for lh, _ in results]),
                    done_nwk=np.array([nw for _, nw in results]))
                ckper.write(engine, st, extra=extra)

        if fast and i > 0:
            if not engine.compact:
                engine.tree_evaluate(2.0)
        else:
            # -S compaction evaluates at fixed branch lengths: model
            # optimization runs, branch smoothing is skipped (the
            # compacted row spaces carry no partial-traversal state)
            if not engine.compact:
                engine.tree_evaluate(1.0)
            optimizer.mod_opt(likelihood_epsilon, checkpointer=ckp_cb)
        results.append((engine.likelihood, result_newick(engine)))
        if resume_iter is not None and i == resume_iter:
            resume_iter = None
    out = RunResult(engine.likelihood, result_newick(engine), engine, [])
    out.best_trees = results
    return out


def run_search(alignment: Alignment, tree_newick: str,
               estimate_model: bool = True,
               initial_radius: Optional[int] = None,
               search_convergence: bool = False,
               step_width: int = 5, max_rearrange: int = 21,
               constraint_newick: Optional[str] = None,
               random_seed: int = 12345,
               checkpoint_run_id: Optional[str] = None,
               checkpoint_workdir: str = '.',
               resume_from_checkpoint: bool = False,
               save_best_trees: int = 0,
               auto_prot_selection: str = 'ml',
               do_cutoff: bool = True,
               verbose: bool = False,
               **engine_kwargs) -> RunResult:
    """Full ML search (reference BIG_RAPID_MODE path, axml.c:2730-2772).
    With constraint_newick set, the starting tree is a random resolution
    of the multifurcating constraint and SPR moves are restricted to it
    (-g mode)."""
    constraint = None
    if constraint_newick is not None:
        from .io.constraint import read_constraint_tree
        from .engine import LikelihoodEngine
        num_branches = engine_kwargs.get('num_branches', 1)
        tree = Tree(alignment.taxon_names, num_branches=num_branches)
        constraint = read_constraint_tree(constraint_newick, tree,
                                          random_seed)
        # only tip groups are trusted; inner nodes renumber during search
        constraint[alignment.n_taxa + 1:] = -9
        engine = LikelihoodEngine(alignment, tree, **engine_kwargs)
    else:
        engine = _setup(alignment, tree_newick, **engine_kwargs)
    tr = engine.tree

    t0 = time.time()
    log: List = []

    def log_fn(lnl):
        # accumulated_time semantics: the (t, lnL) series continues across
        # restarts (searchAlgo.c:1197, axml.c printLog)
        log.append((acc0 + time.time() - t0, lnl))
        if verbose:
            print(f'[{acc0 + time.time() - t0:9.2f}s] lnL {lnl:.6f}',
                  flush=True)

    import json

    cmd = _cmd_signature('search', engine_kwargs,
                         epsilon=0.1, step_width=step_width,
                         max_rearrange=max_rearrange,
                         convergence=search_convergence,
                         constraint=bool(constraint_newick),
                         initial_radius=initial_radius,
                         do_cutoff=do_cutoff,
                         auto_prot=auto_prot_selection)
    resume = None
    checkpointer_cb = None
    acc0 = 0.0
    if checkpoint_run_id is not None:
        from .checkpoint import (Checkpointer, SearchState, PHASE_IDS,
                                 PHASE_NAMES, check_cmd_compatibility)
        ckper = Checkpointer(checkpoint_run_id, workdir=checkpoint_workdir)
        latest = Checkpointer.latest(checkpoint_run_id, checkpoint_workdir)
        if resume_from_checkpoint and latest is not None:
            state, extras = Checkpointer.read(latest, engine)
            check_cmd_compatibility(extras.get('cmd'), cmd)
            resume = dict(extras)
            resume['phase'] = PHASE_NAMES[state.state]
            resume.setdefault('lh', state.likelihood)
            acc0 = state.accumulated_time

        def checkpointer_cb(phase, search, vars_):
            st = SearchState(
                state=PHASE_IDS[phase], likelihood=engine.likelihood,
                accumulated_time=acc0 + (time.time() - t0),
                best_trav=int(vars_.get('best_trav', 5)),
                maxtrav=int(vars_.get('maxtrav', 5)),
                impr=bool(vars_.get('impr', True)),
                cutoff=bool(vars_.get('cutoff', do_cutoff)),
                thorough=(phase == 'SLOW_SPRS'))
            extra = dict(vars_)
            extra['cmd'] = json.dumps(cmd)
            extra['tree0'], extra['tree1'] = search.rf_newicks
            ckper.write(engine, st, extra=extra)

    engine.evaluate(tr.start, full_traversal_=True)
    if resume is None:
        engine.tree_evaluate(1.0)

    optimizer = ModelOptimizer(engine, auto_prot_selection)
    search = SprSearch(engine, step_width=step_width,
                       max_rearrange=max_rearrange,
                       initial_radius=initial_radius,
                       search_convergence=search_convergence,
                       constraint=constraint,
                       save_best_trees=save_best_trees,
                       do_cutoff=do_cutoff,
                       log_fn=log_fn, checkpointer=checkpointer_cb)
    lnl = search.compute_big_rapid(mod_opt_fn=optimizer.mod_opt,
                                   estimate_model=estimate_model,
                                   resume=resume)
    result = RunResult(lnl, result_newick(engine), engine, log)
    if search.best_ml is not None:
        good = []
        for rank in range(1, search.best_ml.nvalid + 1):
            snap = search.best_ml.recall(rank, tr)
            engine.evaluate(tr.start, full_traversal_=True)
            good.append((engine.likelihood, result_newick(engine)))
        result.best_trees = good
        search.best_ml.recall(1, tr)
        engine.evaluate(tr.start, full_traversal_=True)
    return result


def run_quartets(alignment: Alignment, tree_newick: str,
                 n_random: Optional[int] = None,
                 grouping_file: Optional[str] = None,
                 random_seed: int = 12345,
                 likelihood_epsilon: float = 0.1,
                 out_path: Optional[str] = None,
                 checkpoint_run_id: Optional[str] = None,
                 checkpoint_workdir: str = '.',
                 resume_from_checkpoint: bool = False,
                 checkpoint_interval: int = 1000,
                 **engine_kwargs):
    """Quartet evaluation mode (-f q): optimize the model on the
    comprehensive starting tree, then evaluate quartet topologies
    (reference quartets.c computeQuartets :349).

    With checkpoint_run_id set, a QUARTETS checkpoint is written every
    checkpoint_interval (-I) quartets carrying the quartet counter and the
    output-file offset; on resume the model optimization is skipped (the
    checkpoint carries the fitted model), the output file is truncated to
    the saved offset and evaluation continues at the saved quartet
    (quartets.c:329-342, 385-405)."""
    import json
    import os

    from .search.quartets import compute_quartets, parse_grouping_file

    engine = _setup(alignment, tree_newick, **engine_kwargs)
    tr = engine.tree

    cmd = _cmd_signature('quartets', engine_kwargs, n_random=n_random,
                         grouping=bool(grouping_file), seed=random_seed,
                         epsilon=likelihood_epsilon)
    ckper = None
    skip = 0
    acc0 = 0.0
    resumed = False
    if checkpoint_run_id is not None:
        from .checkpoint import Checkpointer, check_cmd_compatibility
        ckper = Checkpointer(checkpoint_run_id, workdir=checkpoint_workdir)
        latest = Checkpointer.latest(checkpoint_run_id, checkpoint_workdir)
        if resume_from_checkpoint and latest is not None:
            state, extras = Checkpointer.read(latest, engine)
            check_cmd_compatibility(extras.get('cmd'), cmd)
            skip = int(extras.get('quartet_counter', 0))
            acc0 = state.accumulated_time
            resumed = True
            offset = int(extras.get('out_offset', 0))
            if out_path and os.path.exists(out_path):
                with open(out_path, 'r+') as fh:
                    fh.truncate(offset)        # quartets.c:398-405

    t0 = time.time()
    if not resumed:
        # on resume the fitted model comes from the checkpoint and the
        # comprehensive tree is irrelevant (each quartet rebuilds its own
        # 4-taxon topology), exactly like the reference (quartets.c:386-405)
        engine.evaluate(tr.start, full_traversal_=True)
        engine.tree_evaluate(1.0)
        ModelOptimizer(engine).mod_opt(likelihood_epsilon)

    groups = None
    if grouping_file is not None:
        groups = parse_grouping_file(grouping_file, tr.name_to_number)

    checkpoint_fn = None
    if ckper is not None:
        from .checkpoint import QUARTETS, SearchState

        def checkpoint_fn(n_done, out_offset):
            st = SearchState(state=QUARTETS, likelihood=engine.likelihood,
                             accumulated_time=acc0 + (time.time() - t0))
            ckper.write(engine, st,
                        extra=dict(cmd=json.dumps(cmd),
                                   quartet_counter=n_done,
                                   out_offset=out_offset))

    return compute_quartets(engine, n_random=n_random, groups=groups,
                            seed=random_seed, out_path=out_path,
                            checkpoint_interval=checkpoint_interval,
                            checkpoint_fn=checkpoint_fn, skip=skip,
                            append=resumed)
