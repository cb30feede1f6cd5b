"""Device kernels (jnp + Pallas): tracing, lighting, ReSTIR, post-processing."""
