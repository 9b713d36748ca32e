import time
import jax, jax.numpy as jnp
import loco_mujoco_tpu as lmt

env = lmt.make("UnitreeA1.simple.real", debug=True)
key = jax.random.PRNGKey(0)
N = 1024

t0 = time.time()
reset_fn = jax.jit(jax.vmap(env.reset))
states = reset_fn(jax.random.split(key, N))
states.obs.block_until_ready()
print("vmapped reset compiled+ran in %.1fs, obs %s on %s" % (
    time.time()-t0, states.obs.shape, list(states.obs.devices())[0].platform), flush=True)

step_fn = jax.jit(jax.vmap(env.step))
actions = jnp.zeros((N, env.action_dim))
t0 = time.time()
states = step_fn(states, actions)
states.obs.block_until_ready()
print("vmapped step compiled+ran in %.1fs" % (time.time()-t0), flush=True)

t0 = time.time()
for _ in range(100):
    states = step_fn(states, actions)
states.obs.block_until_ready()
dt = time.time()-t0
print("100 steps x %d envs: %.3fs -> %.0f env-steps/s" % (N, dt, 100*N/dt), flush=True)
print("reward mean %.4f done frac %.3f qpos_z mean %.4f" % (
    float(states.reward.mean()), float(states.done.mean()), float(states.data.qpos[:,2].mean())))
