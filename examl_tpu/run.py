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


def run_tree_evaluation(alignment: Alignment, tree_newick: str,
                        likelihood_epsilon: float = 0.1,
                        fast: bool = False,
                        auto_prot_selection: str = 'ml',
                        **engine_kwargs) -> RunResult:
    """Evaluate/optimize fixed topologies (reference optimizeTrees :2251).
    tree_newick may contain several ';'-terminated trees (-f e evaluates
    each; -f E = fast only optimizes branch lengths after the first).
    RunResult carries the last tree; .best_trees lists all (lnL, newick)."""
    trees = [t.strip() + ';' for t in tree_newick.split(';') if t.strip()]
    engine = _setup(alignment, trees[0], **engine_kwargs)
    tr = engine.tree
    results = []
    optimizer = ModelOptimizer(engine, auto_prot_selection)
    for i, nwk in enumerate(trees):
        if i > 0:
            parse_newick(nwk, tr)
            engine.reset_branches()
        engine.evaluate(tr.start, full_traversal_=True)
        if fast and i > 0:
            engine.tree_evaluate(2.0)
        else:
            engine.tree_evaluate(1.0)
            optimizer.mod_opt(likelihood_epsilon)
        results.append((engine.likelihood, result_newick(engine)))
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
        log.append((time.time() - t0, lnl))
        if verbose:
            print(f'[{time.time() - t0:9.2f}s] lnL {lnl:.6f}', flush=True)

    resume = None
    checkpointer_cb = None
    if checkpoint_run_id is not None:
        from .checkpoint import Checkpointer, SearchState, FAST_SPRS, SLOW_SPRS
        ckper = Checkpointer(checkpoint_run_id, workdir=checkpoint_workdir)
        latest = Checkpointer.latest(checkpoint_run_id, checkpoint_workdir)
        if resume_from_checkpoint and latest is not None:
            state, extras = Checkpointer.read(latest, engine)
            resume = dict(extras)
            resume['phase'] = ('FAST_SPRS'
                               if state.state == FAST_SPRS else 'SLOW_SPRS')
            resume.setdefault('lh', state.likelihood)

        def checkpointer_cb(phase, search, vars_):
            st = SearchState(
                state=(FAST_SPRS if phase == 'FAST_SPRS' else SLOW_SPRS),
                likelihood=engine.likelihood)
            ckper.write(engine, st, extra=vars_)

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
                 **engine_kwargs):
    """Quartet evaluation mode (-f q): optimize the model on the
    comprehensive starting tree, then evaluate quartet topologies
    (reference quartets.c computeQuartets :349)."""
    from .search.quartets import compute_quartets, parse_grouping_file

    engine = _setup(alignment, tree_newick, **engine_kwargs)
    tr = engine.tree
    engine.evaluate(tr.start, full_traversal_=True)
    engine.tree_evaluate(1.0)
    ModelOptimizer(engine).mod_opt(likelihood_epsilon)

    groups = None
    if grouping_file is not None:
        groups = parse_grouping_file(grouping_file, tr.name_to_number)
    return compute_quartets(engine, n_random=n_random, groups=groups,
                            seed=random_seed, out_path=out_path)
