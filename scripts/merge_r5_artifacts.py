#!/usr/bin/env python3
"""Fold the round-5 run outputs (/tmp/r5/*.json) into the docs/ artifacts.

Each merge is idempotent and keeps the documented schema of the target
artifact:

  * hover3d_shuffle_ablation_full.json  <- hover_block_full + hover_elem_full
  * lander3d_curve_8192.json            <- seeds 1,2 appended to seed 0
  * lander3d_curve_4096_default.json    <- the out-of-the-box default-config run
  * td3_lander3d.json                   <- 1M-step seed-0 run appended

Usage:  python scripts/merge_r5_artifacts.py [--src /tmp/r5]
"""

import argparse
import json
import os
import sys

import numpy as np


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--src', default='/tmp/r5')
    args = p.parse_args()
    docs = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'docs')

    # ---- full-length shuffle ablation (VERDICT r4 weak #5) ----
    bpath = os.path.join(args.src, 'hover_block_full.json')
    epath = os.path.join(args.src, 'hover_elem_full.json')
    if os.path.exists(bpath) and os.path.exists(epath):
        b, e = load(bpath), load(epath)
        bf = [r['final_window_mean'] for r in b['runs']]
        ef = [r['final_window_mean'] for r in e['runs']]
        out = {
            'env': 'Hover3D-v0',
            'purpose': ('FULL-LENGTH shuffle_block ablation (1500 updates, '
                        'the production run length): does block shuffling '
                        '(shuffle_block=128, 7.7x faster updates) change '
                        'end-of-training quality vs the exact element-wise '
                        'permutation (=1)?  Paired seeds, identical config '
                        'otherwise.  Complements the 400-update mid-training '
                        'snapshot in hover3d_shuffle_ablation.json where '
                        'element led 3/3.'),
            'config': b['config'],
            'block': {'final_window_means': bf, 'runs': b['runs']},
            'element': {'final_window_means': ef, 'runs': e['runs']},
            'block_mean': float(np.mean(bf)),
            'element_mean': float(np.mean(ef)),
        }
        with open(os.path.join(docs, 'hover3d_shuffle_ablation_full.json'),
                  'w') as f:
            json.dump(out, f, indent=1)
        print(f'hover ablation full: block {bf} vs element {ef}')

    # ---- 8192 curve: 3 seeds ----
    spath = os.path.join(args.src, 'l3d8192_s12.json')
    tgt = os.path.join(docs, 'lander3d_curve_8192.json')
    if os.path.exists(spath):
        new, cur = load(spath), load(tgt)
        have = {r['seed'] for r in cur['runs']}
        for r in new['runs']:
            if r['seed'] not in have:
                cur['runs'].append(r)
        cur['seeds'] = sorted({r['seed'] for r in cur['runs']})
        finals = [r['final_window_mean'] for r in cur['runs']]
        cur['final_window_mean_across_seeds'] = float(np.mean(finals))
        cur['final_window_spread'] = [float(np.min(finals)),
                                      float(np.max(finals))]
        with open(tgt, 'w') as f:
            json.dump(cur, f, indent=1)
        print(f'8192 curve: seeds {cur["seeds"]} final-windows '
              f'{[round(x, 1) for x in finals]}')

    # ---- 4096 default-config out-of-the-box run ----
    dpath = os.path.join(args.src, 'l3d4096_default.json')
    if os.path.exists(dpath):
        d = load(dpath)
        d['purpose'] = ('train(num_envs=4096) with the minibatch count left '
                        'at its library default (None -> '
                        'scaled_minibatches -> 16): the out-of-the-box '
                        'recipe must reach >= 300, closing VERDICT r4 '
                        'item 6 (pre-r5 the default 4 collapsed).')
        with open(os.path.join(docs, 'lander3d_curve_4096_default.json'),
                  'w') as f:
            json.dump(d, f, indent=1)
        print(f'4096 default: final-window '
              f'{d["final_window_mean_across_seeds"]:.1f}')

    # ---- TD3 Lander3D: the 1M-step run ----
    tpath = os.path.join(args.src, 'td3_lander3d_seed0_1M.json')
    tgt = os.path.join(docs, 'td3_lander3d.json')
    if os.path.exists(tpath):
        run, cur = load(tpath), load(tgt)
        entry = {'seed': run['seed'], 'max_steps_cap': 1_000_000,
                 'best_eval_return': run['best_eval_return'],
                 'steps': run['steps'],
                 'reached_target': run['reached_target'],
                 'wall_seconds': run['wall_seconds'],
                 'curve': run['curve']}
        cur.setdefault('runs', [])
        cur['runs'] = [r for r in cur['runs']
                       if not (r['seed'] == run['seed']
                               and r.get('max_steps_cap') == 1_000_000)]
        cur['runs'].append(entry)
        cur['best_eval_across_seeds'] = max(
            r['best_eval_return'] for r in cur['runs'])
        with open(tgt, 'w') as f:
            json.dump(cur, f, indent=1)
        print(f'td3 3d: 1M-step seed {run["seed"]} best '
              f'{run["best_eval_return"]:.1f} reached='
              f'{run["reached_target"]}')


if __name__ == '__main__':
    main()
