"""Device (JAX/XLA/Pallas) compute substrate."""


def backend_available() -> bool:
    try:
        import jax  # noqa: F401
        return True
    except Exception:
        return False
