"""HyperNEAT indirect encoding (learn/hyperneat.py): decoder geometry,
CPPN query semantics, evolution machinery, and a short end-to-end run."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gym_copter_tpu.learn import hyperneat as hn
from gym_copter_tpu.learn import neuroevolution as ne


CFG = hn.HyperNeatConfig(pop_size=8, episode_reps=2, cppn_hidden=8,
                         substrate_hidden=4, max_steps=50,
                         topk=2, holdout_reps=2)


def test_substrate_matches_reference_geometry():
    """Inputs on the y=-1 line, hidden inside the config's [-0.5, 0.5]
    region at y=0, motors on the x=+1 edge — the attic config layout
    (attic/neat/config/lander3d [Substrate])."""
    sub = hn.make_substrate(12, 4, 8)
    assert sub.inputs.shape == (12, 2)
    np.testing.assert_allclose(np.asarray(sub.inputs[:, 1]), -1.0)
    np.testing.assert_allclose(np.asarray(sub.hidden[:, 1]), 0.0)
    assert float(sub.hidden[:, 0].min()) == -0.5
    assert float(sub.hidden[:, 0].max()) == 0.5
    np.testing.assert_allclose(np.asarray(sub.outputs[:, 0]), 1.0)


def test_decoder_produces_phenotype_genome():
    """decode(cppn) must be a population-stacked neuroevolution.Genome
    with the right shapes, binary masks, and weights inside the [ES]
    max_weight band."""
    key = jax.random.PRNGKey(0)
    cppn = hn.init_cppn_population(key, CFG)
    sub = hn.make_substrate(6, 2, CFG.substrate_hidden)
    decode = hn.make_decoder(sub, CFG)
    g = decode(cppn)
    P, H, I, A = CFG.pop_size, CFG.substrate_hidden, 6, 2
    assert g.w_in.shape == (P, H, I) and g.m_in.shape == (P, H, I)
    assert g.w_rec.shape == (P, H, H)
    assert g.w_out.shape == (P, A, H)
    assert g.w_dir.shape == (P, A, I)
    assert g.b_h.shape == (P, H) and g.b_out.shape == (P, A)
    for m in (g.m_in, g.m_rec, g.m_out, g.m_dir):
        vals = np.unique(np.asarray(m))
        assert set(vals).issubset({0.0, 1.0})
    assert float(jnp.abs(g.w_in).max()) <= CFG.max_weight + 1e-6


def test_decoder_is_coordinate_function():
    """HyperNEAT's defining property: the phenotype weight between two
    substrate nodes is a pure function of their coordinates — two
    connections with identical endpoint coordinates get identical
    weights.  Build two substrates sharing one coordinate pair and check
    the decoded weight agrees."""
    key = jax.random.PRNGKey(1)
    cppn = hn.init_cppn_population(key, CFG)
    sub = hn.make_substrate(6, 2, CFG.substrate_hidden)
    decode = hn.make_decoder(sub, CFG)
    g = decode(cppn)
    # query the CPPN directly at the (input0, hidden0) pair and compare
    # with the decoded w_in[:, 0, 0] (channel 0 = in->hid)
    coord = jnp.concatenate([sub.inputs[0], sub.hidden[0]])[None, :]
    raw = hn._cppn_forward(cppn, coord)
    expect = CFG.max_weight * jnp.tanh(raw[:, 0, 0])
    np.testing.assert_allclose(np.asarray(g.w_in[:, 0, 0]),
                               np.asarray(expect), rtol=1e-6)


def test_evolve_preserves_shapes_and_elites():
    key = jax.random.PRNGKey(2)
    cppn = hn.init_cppn_population(key, CFG)
    fit = jnp.arange(CFG.pop_size, dtype=jnp.float32)
    evolve = hn.make_evolve_fn(CFG)
    child = evolve(cppn, fit, jax.random.PRNGKey(3))
    assert jax.tree.structure(child) == jax.tree.structure(cppn)
    # elite slots carry the fittest genomes verbatim (fit is ascending,
    # so genome pop_size-1 is the best)
    np.testing.assert_array_equal(np.asarray(child.w_in[0]),
                                  np.asarray(cppn.w_in[CFG.pop_size - 1]))
    assert set(np.unique(np.asarray(child.act_sel))).issubset({0, 1, 2})


def test_short_evolution_runs_end_to_end():
    champ, hist, _ = hn.evolve_population(
        'Lander1D-v0', CFG, max_generations=3, seed=0)
    assert champ is not None
    assert len(hist) == 3
    for h in hist:
        assert np.isfinite(h['best_fitness'])
        assert np.isfinite(h['holdout_best'])
    mean_score, per_ep = hn.evaluate_champion(champ, 'Lander1D-v0', CFG,
                                              reps=4)
    assert np.isfinite(mean_score) and per_ep.shape == (4,)
