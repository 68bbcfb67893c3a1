"""Multi-client continuous-batching simulation (reference examples/parallel):
N concurrent requests share one KV pool through the slot scheduler; requests
arrive while others are mid-generation."""

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--n-clients", type=int, default=6)
    ap.add_argument("--n-slots", type=int, default=3)
    args = ap.parse_args(argv)

    from _common import load_model
    from omni_tpu.runtime.slots import SlotScheduler, SlotState

    ctx, cfg, _ = load_model(args.model, n_ctx=512)
    sched = SlotScheduler(ctx, n_slots=args.n_slots, n_batch=64)

    rng = np.random.default_rng(0)
    pending = [rng.integers(1, cfg.n_vocab, rng.integers(4, 12)).astype(np.int32)
               for _ in range(args.n_clients)]
    results = {}
    launched = {}

    it = 0
    while pending or sched.has_work():
        while pending:
            slot = sched.launch(pending[0], max_new=8)
            if slot is None:
                break
            launched[slot.id] = (len(results) + len([1 for s in launched]), pending.pop(0))
        sched.step()
        for s in sched.slots:
            if s.state == SlotState.DONE:
                results[id(s.prompt)] = list(s.out_tokens)
                print(f"slot {s.id}: {len(s.out_tokens)} tokens "
                      f"{s.out_tokens[:6]}...")
                sched.release(s)
        it += 1
        if it > 500:
            raise RuntimeError("scheduler did not converge")
    print(f"served {len(results)} requests on {args.n_slots} slots "
          f"in {it} scheduler iterations; {sched.metrics()}")
    assert len(results) == args.n_clients
    return results


if __name__ == "__main__":
    main()
