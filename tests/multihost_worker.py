"""Worker process for the 2-host distributed test (tests/test_multihost.py).

Each worker is one *process* of a jax.distributed cluster (localhost
coordinator, 4 virtual CPU devices per process -> 8 global). It drives the
REAL multi-host entry points — ``init_distributed`` bootstrapping, a
cross-process (data=2, model=4) mesh, one distributed training chunk, a
``fetch_to_host`` allgather of the sharded tables, and one distributed
evaluation — and asserts each against the process-local single-device result
(identical on every process by shared seed). SURVEY.md §2.10's communication
backend row: ICI collectives are covered by tests/test_parallel.py; this
worker covers the DCN/process boundary.

Not a pytest module: run as ``python multihost_worker.py <pid> <nprocs>
<port>`` (see test_multihost.py, which spawns the pair).
"""

import sys

import numpy as np


def main():
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")

    from gru4rec_tpu.parallel.mesh import init_distributed

    init_distributed(coordinator_address=f"localhost:{port}",
                     num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 4 * nprocs, jax.device_count()
    # a second call must be a no-op, not a crash
    init_distributed(coordinator_address=f"localhost:{port}",
                     num_processes=nprocs, process_id=pid)

    import jax.numpy as jnp

    from gru4rec_tpu.config import GRU4RecConfig
    from gru4rec_tpu.parallel.dist_step import (_strip_scratch,
                                                make_dist_chunk_fn,
                                                shard_train_state,
                                                unshard_train_state)
    from gru4rec_tpu.parallel.mesh import fetch_to_host, make_mesh
    from gru4rec_tpu.train.step import init_train_state, make_chunk_fn

    n_items = 90
    cfg = GRU4RecConfig(
        loss="bpr-max", final_act="elu-1", layers=[16], batch_size=8,
        n_sample=12, chunk_size=5, item_pad_multiple=32, learning_rate=0.1,
        momentum=0.2, adapt="adagrad", dropout_p_hidden=0.0,
        dropout_p_embed=0.0, sampler="searchsorted", compute_dtype="float32",
        opt_state_dtype="float32", constrained_embedding=True,
    )
    rng = np.random.RandomState(0)
    C, B = cfg.chunk_size, cfg.batch_size
    in_c = rng.randint(0, n_items, (C, B)).astype(np.int32)
    out_c = rng.randint(0, n_items, (C, B)).astype(np.int32)
    valid_c = np.ones((C, B), bool)
    valid_c[-1, B // 2:] = False
    reset_c = np.zeros((C, B), bool)
    reset_c[0] = True
    n_pad = ((n_items + cfg.item_pad_multiple - 1)
             // cfg.item_pad_multiple) * cfg.item_pad_multiple
    cdf = np.linspace(0.01, 1.0, n_items, dtype=np.float32)
    logp0 = np.abs(rng.randn(n_pad)).astype(np.float32) + 0.1

    # process-local single-device reference (identical on both processes)
    s1 = init_train_state(cfg, n_items, jax.random.PRNGKey(3))
    f1 = make_chunk_fn(cfg, n_items)
    args1 = tuple(jnp.asarray(a) for a in (in_c, out_c, valid_c, reset_c,
                                           cdf, logp0))
    s1, loss1, ev1 = f1(s1, *args1)
    wy1 = np.asarray(s1.params["Wy"])

    # cross-process mesh: data axis spans the two processes
    nm = 4
    mesh = make_mesh(2, nm)
    local_procs = {d.process_index for d in mesh.devices.flat}
    assert local_procs == set(range(nprocs)), local_procs

    s2 = init_train_state(cfg, n_items, jax.random.PRNGKey(3))
    s2 = shard_train_state(s2, cfg, mesh)
    f2 = make_dist_chunk_fn(cfg, n_items, mesh)
    out = f2(s2.params, s2.opt_state, s2.H, s2.key, s2.step,
             *(np.asarray(a) for a in (in_c, out_c, valid_c, reset_c)),
             np.asarray(cdf), np.asarray(logp0))
    params2, opt2, H2, key2, step2, loss2, ev2 = out

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    assert float(ev1) == float(ev2), (float(ev1), float(ev2))
    wy2 = _strip_scratch(fetch_to_host(params2["Wy"]), nm)
    np.testing.assert_allclose(wy1, wy2, rtol=2e-4, atol=1e-6)
    print(f"[worker {pid}] TRAIN CHUNK OK loss={float(loss2):.6f}", flush=True)

    # a (1, 8) mesh puts the MODEL axis across the process boundary: the
    # per-step row gathers (psum over 'model') and the shard-local scatters
    # ride DCN instead of staying host-local
    mesh_m = make_mesh(1, 8)
    s3 = init_train_state(cfg, n_items, jax.random.PRNGKey(3))
    s3 = shard_train_state(s3, cfg, mesh_m)
    f3 = make_dist_chunk_fn(cfg, n_items, mesh_m)
    out3 = f3(s3.params, s3.opt_state, s3.H, s3.key, s3.step,
              *(np.asarray(a) for a in (in_c, out_c, valid_c, reset_c)),
              np.asarray(cdf), np.asarray(logp0))
    np.testing.assert_allclose(float(loss1), float(out3[5]), rtol=1e-4)
    wy3 = _strip_scratch(fetch_to_host(out3[0]["Wy"]), 8)
    np.testing.assert_allclose(wy1, wy3, rtol=2e-4, atol=1e-6)
    print(f"[worker {pid}] MODEL-AXIS CHUNK OK", flush=True)

    # full state gather across the process boundary
    s2u = unshard_train_state(
        s2._replace(params=params2, opt_state=opt2, H=H2, key=key2,
                    step=step2), cfg, mesh)
    np.testing.assert_allclose(np.asarray(s1.params["Wh"][0]),
                               s2u.params["Wh"][0], rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s1.opt_state["sparse"]["Wy"]["acc"]),
        s2u.opt_state["sparse"]["Wy"]["acc"], rtol=2e-4, atol=1e-6)
    print(f"[worker {pid}] UNSHARD OK", flush=True)

    # distributed evaluation vs the process-local single-chip evaluator
    import pandas as pd

    from gru4rec_tpu.eval import evaluate
    from gru4rec_tpu.models.gru4rec import GRU4Rec

    def sessions(n_sessions, n_items=40, seed=0):
        r = np.random.RandomState(seed)
        rows, t = [], 0
        for s in range(n_sessions):
            i = r.randint(n_items)
            for _ in range(r.randint(3, 7)):
                rows.append((s, f"it{i}", t))
                t += 1
                i = (7 * i + 3) % n_items
        return pd.DataFrame(rows, columns=["SessionId", "ItemId", "Time"])

    m = GRU4Rec(loss="bpr-max", layers=[16], batch_size=8, n_sample=16,
                n_epochs=1, chunk_size=16, constrained_embedding=True)
    m.fit(sessions(60))
    test = sessions(20, seed=9)

    # the user-facing fit(mesh=...) across the process boundary: covers the
    # cross-process schedule upload (_upload_stacks stacks sharded over the
    # data axis) and the end-of-fit state gather. Identical RNG + no
    # dropout => the loss trajectory must match the process-local fit's.
    md = GRU4Rec(loss="bpr-max", layers=[16], batch_size=8, n_sample=16,
                 n_epochs=1, chunk_size=16, constrained_embedding=True,
                 compute_dtype="float32")
    md.fit(sessions(60), mesh=mesh)
    ms = GRU4Rec(loss="bpr-max", layers=[16], batch_size=8, n_sample=16,
                 n_epochs=1, chunk_size=16, constrained_embedding=True,
                 compute_dtype="float32")
    ms.fit(sessions(60))
    np.testing.assert_allclose(
        [e["loss"] for e in md.epoch_stats],
        [e["loss"] for e in ms.epoch_stats], rtol=1e-3)
    np.testing.assert_allclose(np.asarray(md.params["Wy"]),
                               np.asarray(ms.params["Wy"]),
                               rtol=2e-3, atol=1e-5)
    print(f"[worker {pid}] DIST FIT OK loss={md.epoch_stats[-1]['loss']:.4f}",
          flush=True)

    # checkpoint writes are process-0-only (shared-FS race guard); every
    # process can load the result
    import os
    import tempfile

    ckpt = os.path.join(tempfile.gettempdir(),
                        f"mh_ckpt_{port}_{pid}.npz")
    if os.path.exists(ckpt):
        os.unlink(ckpt)
    md.savemodel(ckpt)
    wrote = os.path.exists(ckpt)
    assert wrote == (pid == 0), (pid, wrote)
    if wrote:
        m_loaded = GRU4Rec.loadmodel(ckpt)
        np.testing.assert_allclose(np.asarray(m_loaded.params["Wy"]),
                                   np.asarray(md.params["Wy"]),
                                   rtol=1e-6, atol=1e-7)
        os.unlink(ckpt)
    print(f"[worker {pid}] CKPT GUARD OK wrote={wrote}", flush=True)
    rec_s, mrr_s = evaluate(m, test, cut_off=[1, 5], batch_size=8,
                            mode="standard")
    rec_d, mrr_d = evaluate(m, test, cut_off=[1, 5], batch_size=8,
                            mode="standard", mesh=mesh)
    np.testing.assert_allclose(rec_s, rec_d, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(mrr_s, mrr_d, rtol=1e-5, atol=1e-7)
    print(f"[worker {pid}] DIST EVAL OK rec={rec_d}", flush=True)

    # cross-process serving: mesh top-k against the single-chip path
    sess = list(range(8))
    inputs = ["it3", "it10", "it7", "it1", "it0", "it5", "it9", "it2"]
    ids_s, sc_s = m.predict_topk(sess, inputs, k=3, batch=8)
    m.H = None
    m._current_session = None
    m._predict_batch = None
    ids_d, sc_d = m.predict_topk(sess, inputs, k=3, batch=8, mesh=mesh)
    assert (ids_s == ids_d).all(), (ids_s, ids_d)
    np.testing.assert_allclose(sc_s, sc_d, rtol=1e-5, atol=1e-7)
    print(f"[worker {pid}] DIST TOPK OK", flush=True)
    print(f"[worker {pid}] MULTIHOST PASS", flush=True)


if __name__ == "__main__":
    main()
