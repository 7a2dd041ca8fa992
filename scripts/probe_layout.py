"""Effective HBM bandwidth touching grid-shaped arrays (carry-fed scans)."""
import functools, json, time
import jax, jax.numpy as jnp

E = 4096
S = 1024
shapes = {
    '(E,16,16,3) int32': (E, 16, 16, 3),
    '(E,768) int32 flat': (E, 768),
    '(E,256) int32 packed-equiv': (E, 256),
    '(E,19,19,3) int32': (E, 19, 19, 3),
}

def bw(shape):
    x = jnp.arange(1, 1 + int(jnp.prod(jnp.array(shape))), dtype=jnp.int32
                   ).reshape(shape) % 1000

    @functools.partial(jax.jit, static_argnums=1)
    def run(x, steps):
        def body(carry, _):
            x, acc = carry
            # read + write the full array each iteration, serially dependent
            x = x + (acc % 3 + 1)
            return (x, acc + x.sum(dtype=jnp.int32)), None
        (x, acc), _ = jax.lax.scan(
            body, (x, jnp.zeros((), jnp.int32)), None, length=steps)
        return acc

    int(run(x, S))  # compile
    # length-differenced timing
    int(run(x, S // 4))
    t0 = time.perf_counter(); int(run(x, S // 4)); t1 = time.perf_counter()
    int(run(x, S))
    t2 = time.perf_counter(); int(run(x, S)); t3 = time.perf_counter()
    dt = (t3 - t2) - (t1 - t0)
    steps = S - S // 4
    nbytes = 2 * 4 * 1
    for d in shape:
        nbytes *= d
    return nbytes * steps / dt / 1e9

for name, shape in shapes.items():
    print(json.dumps({'shape': name, 'effective_gbps_rw': round(bw(shape), 1)}),
          flush=True)
