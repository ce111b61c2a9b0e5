"""Pure functional jnp kernels: math primitives, transforms, fusion, density.

Everything in this subpackage is side-effect free and jit/vmap/pjit
compatible. Stateful Python wrappers live in ``bayesian_bm25_tpu.models``.
"""
