import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys
import numpy as np, jax, jax.numpy as jnp, dataclasses
jax.config.update('jax_compilation_cache_dir', '/tmp/sherf_tpu_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
from sherf_tpu.core.config import ModelConfig, RenderConfig
from sherf_tpu.core.calibrate import calibrate_budgets, calibrate_sparse_caps
from sherf_tpu.data import SyntheticHumanDataset, collate, make_synthetic_batch
from sherf_tpu.features.sparseconv import prepare_voxel_volume
from sherf_tpu.models import SHERFGenerator
from sherf_tpu.smpl import synthetic_smpl, smpl_forward, big_pose_params

smpl = synthetic_smpl(0)
ds = SyntheticHumanDataset('subject0', smpl, split='train', multi_person=True,
                           num_instance=24, poses_num=8, image_scaling=0.5)

def probe(tag, batch, bodies, margin):
    shapes = [prepare_voxel_volume(b)[1] for b in bodies]
    out_sh = tuple(int(max(s[k] for s in shapes)) for k in range(3))
    caps = calibrate_sparse_caps(bodies, 0.005)
    cfg = ModelConfig(compute_dtype='bfloat16', sparse_caps=caps,
                      render=RenderConfig(depth_resolution=48, density_noise=0.0))
    fitted, worst = calibrate_budgets([batch], cfg, margin=margin)
    cfg = dataclasses.replace(cfg, render=fitted)
    model = SHERFGenerator(cfg, out_sh=out_sh)
    variables = jax.jit(lambda bb: model.init(jax.random.PRNGKey(0), bb, smpl))(batch)
    params = dict(variables).pop('params')
    extra = {k: v for k, v in variables.items() if k != 'params'}
    def f(p, bb, r):
        out, _ = model.apply({'params': p, **extra}, bb, smpl, train=True,
                             noise_mode='none',
                             rngs={'density': r, 'noise': jax.random.fold_in(r, 1)},
                             mutable=['diag'])
        return jnp.sum(out['image_raw']) + jnp.sum(out['weights_image'])
    g = jax.jit(jax.grad(f))(params, batch, jax.random.PRNGKey(1))
    n = sum(float(jnp.isnan(x).sum()) for x in jax.tree.leaves(g))
    print(f'{tag}: nan={n}', flush=True)

bp = big_pose_params()
t_verts = np.asarray(jax.jit(lambda p, s: smpl_forward(smpl, p, s)[0])(
    jnp.asarray(bp['poses']), jnp.asarray(bp['shapes'])))
bodies24 = ds.subject_bodies()
grid_b = collate([ds[0]])
syn_b = make_synthetic_batch(smpl, batch_size=1, H=256, W=256, seed=0)

which = sys.argv[1]
if which == 'a':
    probe('grid-batch/24bodies/m1.5', grid_b, bodies24, 1.5)
elif which == 'b':
    probe('grid-batch/24bodies/m1.15', grid_b, bodies24, 1.15)
elif which == 'c':
    probe('grid-batch/1body/m1.5', grid_b, [bodies24[0]], 1.5)
elif which == 'd':
    probe('syn-batch/default-body/m1.5', syn_b, [t_verts], 1.5)
elif which == 'e':
    probe('syn-batch/24bodies/m1.5', syn_b, bodies24, 1.5)
