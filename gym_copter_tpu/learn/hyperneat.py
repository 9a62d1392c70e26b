"""TPU-native HyperNEAT: CPPN-generated substrate networks.

The reference's NEAT configs are ES-HyperNEAT (attic/neat/config/lander2d
`[Substrate]`/`[ES]` sections): an evolved CPPN is queried over pairs of
substrate coordinates to produce the controller's connection weights.
This module is the TPU-first re-design of that *indirect encoding*
capability (VERDICT r4 missing #2), complementing the direct-encoding GA
in `learn/neuroevolution.py`:

* **Indirect encoding as batched coordinate evaluation.**  A CPPN maps a
  connection's endpoint coordinates (x1, y1, x2, y2) to its weight.
  Querying it for every connection of every genome is one population-
  stacked einsum over a precomputed (n_queries, 4) coordinate table —
  exactly the shape of work the MXU wants, and the reason HyperNEAT is
  *more* TPU-friendly than direct encoding: the phenotype is generated,
  not stored, so the genome is tiny and decode cost is O(pop x queries)
  dense math.
* **Phenotype reuse.**  The decoded network IS a
  `neuroevolution.Genome` (direct + recurrent-hidden blocks with masks),
  so `network_step`, `make_fitness_fn`, and `evaluate_champion` are
  reused unchanged — fitness(cppn) = fitness(decode(cppn)) with the
  decode inside the same jit.
* **Documented deviations from ES-HyperNEAT** (attic/neat/config/
  lander2d [ES]): the quadtree density search (initial_depth/max_depth/
  variance_threshold/division_threshold) places hidden nodes dynamically
  per genome — host-side, shape-changing, XLA-hostile.  Here hidden
  nodes sit at a FIXED uniform resolution inside the config's hidden
  region (y = 0 line, x in [-0.5, 0.5] — the region the config's
  `hidden` ranges span), and the CPPN's expression output (band-pruning
  role, band_threshold 0.3) gates each connection through a
  differentiable-free hard threshold.  Weight scaling uses the config's
  max_weight 8.0.  CPPN hidden activations mutate among
  {gauss, sin, tanh} (activation_options, config :58).

Substrate geometry follows the reference configs: inputs on the y = -1
line (lander3d: 12 coords spanning [-1, 1]; lander2d: the listed
[-.6 .. +.6] span), outputs (motors) on the x = +1 edge
((1,-1),(1,-.5),(1,.5),(1,1) for four motors), hidden in between.
Where the config's coordinate count disagrees with the env's actual
observation arity (the lander2d config lists 8 input coords for a 6-dim
observation), inputs are evenly re-spaced over the same span.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gym_copter_tpu.envs import tasks
from gym_copter_tpu.learn import neuroevolution as ne


class CPPNGenome(NamedTuple):
    """Population-stacked CPPN genomes (leading axis = pop).

    The CPPN is a one-hidden-layer network 4 -> C -> 6 with per-node
    selectable activations and maskable connections (NEAT-style genes):
    inputs (x1, y1, x2, y2); outputs = one weight channel per substrate
    block — [in->hid, hid->hid, hid->out, in->out(direct), bias_h,
    bias_out] — plus a shared expression channel from the same hidden
    features.
    """

    w_in: jnp.ndarray    # (P, C, 4)   CPPN input -> CPPN hidden
    m_in: jnp.ndarray
    w_out: jnp.ndarray   # (P, 7, C)   CPPN hidden -> 6 weight ch. + express
    m_out: jnp.ndarray
    b_h: jnp.ndarray     # (P, C)
    b_out: jnp.ndarray   # (P, 7)
    act_sel: jnp.ndarray  # (P, C) int32 in {0 gauss, 1 sin, 2 tanh}


_N_OUT = 7  # 6 weight channels + 1 expression channel


class Substrate(NamedTuple):
    inputs: jnp.ndarray   # (I, 2)
    hidden: jnp.ndarray   # (H, 2)
    outputs: jnp.ndarray  # (A, 2)


def make_substrate(obs_size: int, action_size: int,
                   n_hidden: int = 8) -> Substrate:
    """Reference-geometry substrate (attic/neat/config/lander3d
    [Substrate]): inputs on y=-1 spanning [-1, 1], hidden on y=0 inside
    the config's [-0.5, 0.5] region, motors on the x=+1 edge."""
    xs_in = jnp.linspace(-1.0, 1.0, obs_size)
    inputs = jnp.stack([xs_in, jnp.full((obs_size,), -1.0)], axis=1)
    xs_h = jnp.linspace(-0.5, 0.5, n_hidden)
    hidden = jnp.stack([xs_h, jnp.zeros((n_hidden,))], axis=1)
    ys_out = jnp.linspace(-1.0, 1.0, action_size)
    outputs = jnp.stack([jnp.ones((action_size,)), ys_out], axis=1)
    return Substrate(inputs=inputs, hidden=hidden, outputs=outputs)


@dataclasses.dataclass(frozen=True)
class HyperNeatConfig:
    """Defaults mirror attic/neat/config/lander2d where applicable."""

    pop_size: int = 96
    episode_reps: int = 10
    fitness_threshold: float = 300.0
    cppn_hidden: int = 16          # static max; num_hidden=1 grows via masks
    substrate_hidden: int = 8      # fixed-resolution hidden layer
    n_elite: int = 2
    tournament: int = 3
    crossover_rate: float = 0.75
    weight_mutate_rate: float = 0.8      # config :52-55
    weight_mutate_power: float = 0.5
    weight_replace_rate: float = 0.1
    weight_init_stdev: float = 1.0
    weight_clip: float = 8.0
    activation_mutate_rate: float = 0.5  # config :58 (activation options)
    conn_toggle_per_child: float = 1.0   # conn_add/delete_prob analogue
    max_weight: float = 8.0              # [ES] max_weight
    express_threshold: float = 0.3       # [ES] band_threshold role
    action_anchor: str = 'hover'
    max_steps: int = 999
    topk: int = 4
    holdout_reps: int = 32
    holdout_margin: float = 10.0

    def as_neat(self) -> ne.NeatConfig:
        """The phenotype-side view (fitness machinery reuse)."""
        return ne.NeatConfig(
            pop_size=self.pop_size, episode_reps=self.episode_reps,
            fitness_threshold=self.fitness_threshold,
            hidden=self.substrate_hidden, action_anchor=self.action_anchor,
            max_steps=self.max_steps, topk=self.topk,
            holdout_reps=self.holdout_reps,
            holdout_margin=self.holdout_margin)


def init_cppn_population(key, cfg: HyperNeatConfig) -> CPPNGenome:
    """Start minimal, NEAT-style: one enabled CPPN hidden unit
    (num_hidden = 1, config :45), the rest masked off to complexify."""
    P, C = cfg.pop_size, cfg.cppn_hidden
    ks = jax.random.split(key, 5)
    std = cfg.weight_init_stdev
    m_in = jnp.zeros((P, C, 4)).at[:, 0, :].set(1.0)
    m_out = jnp.zeros((P, _N_OUT, C)).at[:, :, 0].set(1.0)
    return CPPNGenome(
        w_in=std * jax.random.normal(ks[0], (P, C, 4)),
        m_in=m_in,
        w_out=std * jax.random.normal(ks[1], (P, _N_OUT, C)),
        m_out=m_out,
        b_h=std * jax.random.normal(ks[2], (P, C)),
        b_out=std * jax.random.normal(ks[3], (P, _N_OUT)),
        act_sel=jax.random.randint(ks[4], (P, C), 0, 3),
    )


def _cppn_forward(cppn: CPPNGenome, coords):
    """Query every genome's CPPN at every coordinate pair.

    coords: (Q, 4) -> returns (P, _N_OUT, Q).  Hidden activation is
    selected per node among gauss/sin/tanh (activation_options).
    """
    # (P, C, Q) pre-activations
    z = (jnp.einsum('pcf,qf->pcq', cppn.w_in * cppn.m_in, coords)
         + cppn.b_h[:, :, None])
    acts = jnp.stack([jnp.exp(-z * z), jnp.sin(z), jnp.tanh(z)], axis=0)
    h = jnp.take_along_axis(
        acts, cppn.act_sel[None, :, :, None].astype(jnp.int32), axis=0)[0]
    out = (jnp.einsum('poc,pcq->poq', cppn.w_out * cppn.m_out, h)
           + cppn.b_out[:, :, None])
    return out


def _pairs(a, b):
    """(Na,2) x (Nb,2) -> (Na*Nb, 4) coordinate table, row-major in a."""
    na, nb = a.shape[0], b.shape[0]
    return jnp.concatenate(
        [jnp.repeat(a, nb, axis=0), jnp.tile(b, (na, 1))], axis=1)


def make_decoder(substrate: Substrate, cfg: HyperNeatConfig):
    """decode(cppn) -> phenotype `neuroevolution.Genome`, jit-friendly.

    One CPPN sweep over the concatenated query table produces every
    substrate block; weights are tanh-squashed to [-max_weight,
    max_weight] and a connection is expressed iff the shared expression
    channel at its coordinates exceeds express_threshold (the band-
    pruning role of ES-HyperNEAT's band_threshold).  Biases are queried
    at (node, origin) pairs, the standard HyperNEAT convention.
    """
    inp, hid, out = substrate.inputs, substrate.hidden, substrate.outputs
    I, H, A = inp.shape[0], hid.shape[0], out.shape[0]
    origin = jnp.zeros((1, 2))
    q_in = _pairs(inp, hid)        # in->hid    (I*H)
    q_rec = _pairs(hid, hid)       # hid->hid   (H*H)
    q_out = _pairs(hid, out)       # hid->out   (H*A)
    q_dir = _pairs(inp, out)       # in->out    (I*A)
    q_bh = _pairs(hid, origin)     # bias_h     (H)
    q_bo = _pairs(out, origin)     # bias_out   (A)
    table = jnp.concatenate([q_in, q_rec, q_out, q_dir, q_bh, q_bo], axis=0)
    sizes = [I * H, H * H, H * A, I * A, H, A]
    s = [0]
    for n in sizes:
        s.append(s[-1] + n)

    def decode(cppn: CPPNGenome) -> ne.Genome:
        raw = _cppn_forward(cppn, table)      # (P, _N_OUT, Q)
        P = raw.shape[0]
        w = cfg.max_weight * jnp.tanh(raw[:, :6, :])
        express = jnp.abs(jnp.tanh(raw[:, 6, :])) > cfg.express_threshold

        def block(ch, lo_hi, shape, transpose):
            ws = w[:, ch, lo_hi[0]:lo_hi[1]].reshape((P,) + shape)
            ms = express[:, lo_hi[0]:lo_hi[1]].reshape((P,) + shape)
            if transpose:  # queries are (src, dst); Genome wants (dst, src)
                ws, ms = ws.swapaxes(1, 2), ms.swapaxes(1, 2)
            return ws, ms.astype(ws.dtype)

        # queries are (src, dst) row-major in src; Genome blocks are
        # (dst, src), hence the transpose
        w_in, m_in = block(0, (s[0], s[1]), (I, H), True)     # -> (P, H, I)
        w_rec, m_rec = block(1, (s[1], s[2]), (H, H), True)   # -> (P, H, H)
        w_out, m_out = block(2, (s[2], s[3]), (H, A), True)   # -> (P, A, H)
        w_dir, m_dir = block(3, (s[3], s[4]), (I, A), True)   # -> (P, A, I)
        b_h = w[:, 4, s[4]:s[5]]
        b_out = w[:, 5, s[5]:s[6]]
        return ne.Genome(
            w_dir=w_dir, m_dir=m_dir,
            w_in=w_in, m_in=m_in,
            w_rec=w_rec, m_rec=m_rec,
            w_out=w_out, m_out=m_out,
            b_h=b_h, b_out=b_out,
        )

    return decode


def make_evolve_fn(cfg: HyperNeatConfig):
    """CPPN-genome evolution: same genetic operators as the direct GA
    (tournament, gene-level crossover, weight perturb/replace/clip,
    mask toggling) plus per-node activation mutation
    (activation_mutate_rate, options gauss/sin/tanh)."""
    P = cfg.pop_size

    def tournament(key, fit):
        idx = jax.random.randint(key, (P, cfg.tournament), 0, P)
        return idx[jnp.arange(P), jnp.argmax(fit[idx], axis=1)]

    @jax.jit
    def evolve(cppn: CPPNGenome, fit, key) -> CPPNGenome:
        k_pa, k_pb, k_cx, k_mut = jax.random.split(key, 4)
        pa, pb = tournament(k_pa, fit), tournament(k_pb, fit)
        use_cx = jax.random.bernoulli(k_cx, cfg.crossover_rate, (P,))
        keys = iter(jax.random.split(k_mut, 24))

        out = {}
        for wname, mname in (('w_in', 'm_in'), ('w_out', 'm_out')):
            w, m = getattr(cppn, wname), getattr(cppn, mname)
            n_conn = w[0].size
            pick_b = (jax.random.bernoulli(next(keys), 0.5, w.shape)
                      & use_cx.reshape((P,) + (1,) * (w.ndim - 1)))
            cw = jnp.where(pick_b, w[pb], w[pa])
            cm = jnp.where(pick_b, m[pb], m[pa])
            r = jax.random.uniform(next(keys), w.shape)
            perturb = r < cfg.weight_mutate_rate
            replace = (~perturb) & (r < cfg.weight_mutate_rate
                                    + cfg.weight_replace_rate)
            cw = cw + jnp.where(perturb, cfg.weight_mutate_power
                                * jax.random.normal(next(keys), w.shape), 0.0)
            cw = jnp.where(replace, cfg.weight_init_stdev
                           * jax.random.normal(next(keys), w.shape), cw)
            cw = jnp.clip(cw, -cfg.weight_clip, cfg.weight_clip)
            toggle = jax.random.bernoulli(
                next(keys), cfg.conn_toggle_per_child / n_conn, m.shape)
            cm = jnp.where(toggle, 1.0 - cm, cm)
            out[wname], out[mname] = cw, cm
        for bname in ('b_h', 'b_out'):
            b = getattr(cppn, bname)
            cb = jnp.where(jax.random.bernoulli(
                next(keys), 0.5, b.shape) & use_cx[:, None], b[pb], b[pa])
            cb = cb + jnp.where(
                jax.random.bernoulli(next(keys), cfg.weight_mutate_rate,
                                     b.shape),
                cfg.weight_mutate_power
                * jax.random.normal(next(keys), b.shape), 0.0)
            out[bname] = jnp.clip(cb, -cfg.weight_clip, cfg.weight_clip)

        # activation gene: crossover then mutate to a random option
        a = jnp.where((jax.random.bernoulli(next(keys), 0.5, cppn.act_sel.shape)
                       & use_cx[:, None]),
                      cppn.act_sel[pb], cppn.act_sel[pa])
        re_roll = jax.random.bernoulli(next(keys), cfg.activation_mutate_rate,
                                       a.shape)
        a = jnp.where(re_roll,
                      jax.random.randint(next(keys), a.shape, 0, 3), a)
        out['act_sel'] = a

        child = CPPNGenome(**out)
        elite = jnp.argsort(-fit)[:cfg.n_elite]
        slot = jnp.arange(P)
        src = jnp.where(slot < cfg.n_elite,
                        elite[jnp.minimum(slot, cfg.n_elite - 1)], slot)
        keep = slot < cfg.n_elite

        def pick(c, g):
            mask = keep.reshape((P,) + (1,) * (g.ndim - 1))
            return jnp.where(mask, g[src], c)

        return jax.tree.map(pick, child, cppn)

    return evolve


def evolve_population(env_name: str = 'Lander2D-v0',
                      cfg: HyperNeatConfig = HyperNeatConfig(),
                      env_params=None, max_generations: int = 500,
                      seed: int = 0, eval_seed: int = 1000,
                      log_every: int = 10, callback=None):
    """The HyperNEAT run loop: evolve CPPNs, evaluate their decoded
    substrate phenotypes with the shared fitness machinery, champion by
    top-k fixed-holdout re-scoring (same protocol as
    neuroevolution.evolve_population; returns (champion CPPNGenome with
    pop axis 1, history, final population))."""
    spec = tasks.ALL_TASKS[env_name]
    neat_cfg = cfg.as_neat()
    substrate = make_substrate(spec.obs_size, spec.action_size,
                               cfg.substrate_hidden)
    decode = make_decoder(substrate, cfg)
    fitness_pheno = ne.make_fitness_fn(env_name, neat_cfg, env_params,
                                       seed=eval_seed)
    holdout_pheno = ne.make_fitness_fn(
        env_name, dataclasses.replace(neat_cfg, pop_size=cfg.topk),
        env_params, reps=cfg.holdout_reps, seed=eval_seed + 1)

    @jax.jit
    def fitness(cppn, episode):
        return fitness_pheno(decode(cppn), episode)

    @jax.jit
    def holdout(cppn_k, episode):
        return holdout_pheno(decode(cppn_k), episode)

    evolve_fn = make_evolve_fn(cfg)
    key = jax.random.PRNGKey(seed)
    key, k0 = jax.random.split(key)
    cppn = init_cppn_population(k0, cfg)

    history, best_ever, champion = [], -jnp.inf, None
    train_threshold_gen = None
    for gen in range(max_generations):
        fit = fitness(cppn, jnp.int32(gen))
        best, mean = float(fit.max()), float(fit.mean())
        topk_i = jnp.argsort(-fit)[:cfg.topk]
        cands = ne.take_genomes(cppn, topk_i)
        ho = holdout(cands, jnp.int32(2 ** 30))
        ho_best_i = int(jnp.argmax(ho))
        ho_best = float(ho[ho_best_i])
        rec = {'generation': gen, 'best_fitness': best,
               'mean_fitness': mean, 'holdout_best': ho_best}
        if best >= cfg.fitness_threshold and train_threshold_gen is None:
            train_threshold_gen = gen
            rec['train_threshold_reached'] = True
        history.append(rec)
        if ho_best > best_ever:
            best_ever = ho_best
            champion = ne.take_genome(cands, ho_best_i)
        if callback is not None:
            callback(rec)
        elif gen % log_every == 0:
            print(f'gen {gen:4d}  best {best:8.1f}  mean {mean:8.1f}  '
                  f'holdout {ho_best:8.1f}', flush=True)
        if (best >= cfg.fitness_threshold
                and best_ever >= cfg.fitness_threshold + cfg.holdout_margin):
            break
        key, k = jax.random.split(key)
        cppn = evolve_fn(cppn, fit, k)
    return champion, history, cppn


def evaluate_champion(champion: CPPNGenome, env_name: str,
                      cfg: HyperNeatConfig, env_params=None,
                      reps: int = 100, seed: int = 77,
                      episode: int = 10000):
    """Decoded-champion robust score over fresh episodes (the
    neat-test.py role), mirroring neuroevolution.evaluate_champion."""
    spec = tasks.ALL_TASKS[env_name]
    substrate = make_substrate(spec.obs_size, spec.action_size,
                               cfg.substrate_hidden)
    decode = make_decoder(substrate, cfg)
    pheno = decode(champion)
    one = dataclasses.replace(cfg.as_neat(), pop_size=1)
    fn = ne.make_fitness_fn(env_name, one, env_params, reps=reps,
                            seed=seed, return_episodes=True)
    per_episode = fn(pheno, jnp.int32(episode))[0]
    return float(per_episode.mean()), per_episode
