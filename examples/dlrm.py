#!/usr/bin/env python
"""Models E and F end-to-end: build, predict, train a few steps.

The recom_tpu counterpart of the reference's examples/python/dlrm.py
(models E/F construction, dlrm.py:140-207) — but where the reference only
*builds saved models* for the C++ benchmark to consume, this runs them:
compile, single-batch predict with a bit-exactness check, and (optionally)
a few training steps.

  python examples/dlrm.py --model E --scale 0.05 --batch 256 --train-steps 3
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", choices=["E", "F"], default="E")
    ap.add_argument("--scale", type=float, default=0.05,
                    help="column-count scale (1.0 = full 1000/1200 columns)")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--train-steps", type=int, default=0)
    args = ap.parse_args()

    from recom_tpu import Engine, EngineConfig
    from recom_tpu.models import make_model_e, make_model_f, make_random_batch
    from recom_tpu.oracle import OracleModel

    make = make_model_e if args.model == "E" else make_model_f
    model = make(scale=args.scale)
    n_emb = len(model.embedding_columns)
    print(f"model {model.name}: {n_emb} embedding columns, "
          f"{len(model.dense_columns)} dense")

    eng = Engine(model, EngineConfig())
    batch = make_random_batch(model, args.batch, seed=0)
    out = eng.predict(batch, return_pooled=True)
    print("output:", out["output"].shape, out["output"][:3, 0])

    ref = OracleModel(model).forward(batch)
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)
    print("all pooled embedding outputs bit-exact vs oracle")

    if args.train_steps:
        from recom_tpu.train import Trainer

        tr = Trainer(model, EngineConfig())
        rng = np.random.default_rng(0)
        labels = rng.integers(0, 2, args.batch)
        for i in range(args.train_steps):
            loss = tr.step(batch, labels)
            print(f"step {i}: loss {loss:.5f}")


if __name__ == "__main__":
    main()
