"""Training workloads: fused jitted steps + a shared epoch harness.

One jitted program per workload step; no Python in the hot loop. The WGAN-GP
schedule (5 critic updates : 1 generator update) is restructured into a fused
static-shape group step (see ``gan_step``), preserving the reference's exact
update ratio and data-consumption order.
"""
