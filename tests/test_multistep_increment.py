"""Multi-step incremental chaining (40+20+20 pattern at toy scale):
stage-1 teacher (2 cls) -> stage-2 student (2+2) -> stage-3 student (4+2),
mirroring the reference's re-pointing of ori_config/ori_checkpoint
(SURVEY.md section 5 checkpoint/resume)."""
import numpy as np
import jax
import jax.numpy as jnp

from erd_tpu.models import ERDConfig, ERDDetector, GFLDetector
from tests.test_models import make_batch


def test_three_stage_chain():
    # stage 1: plain GFL with 2 classes
    s1 = GFLDetector(num_classes=2, depth=18)
    v1 = s1.init(jax.random.PRNGKey(0), image_shape=(64, 96))

    # stage 2: ERD 2 -> 4, teacher = stage-1
    s2 = ERDDetector(num_classes=4, depth=18,
                     erd=ERDConfig(ori_num_classes=2,
                                   ers_reg_cap=32))
    v2 = s2.init_student_from_teacher(jax.random.PRNGKey(1), v1)
    losses2 = s2.loss_jit(v2, make_batch(gts=[([[10, 10, 60, 50]], [1]),
                                              ([], [])]),
                          teacher_variables=v1)
    assert np.isfinite(sum(float(x) for x in losses2.values()))

    # stage 3: ERD 4 -> 6, teacher = stage-2 student
    s3 = ERDDetector(num_classes=6, depth=18,
                     erd=ERDConfig(ori_num_classes=4,
                                   ers_reg_cap=32))
    v3 = s3.init_student_from_teacher(jax.random.PRNGKey(2), v2)

    # stage-3 student must reproduce the stage-2 student on its 4 channels,
    # and transitively the stage-1 teacher on the first 2
    imgs = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (1, 64, 96, 3), dtype=np.uint8))
    c1, _ = s1.forward_jit(v1, imgs)
    c2, _ = s2.forward_jit(v2, imgs)
    c3, _ = s3.forward_jit(v3, imgs)
    for a, b, c in zip(c1, c2, c3):
        np.testing.assert_allclose(np.asarray(c[..., :4]), np.asarray(b),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(c[..., :2]), np.asarray(a),
                                   atol=1e-5)

    losses3 = s3.loss_jit(v3, make_batch(gts=[([[10, 10, 60, 50]], [0]),
                                              ([[5, 5, 40, 40]], [1])]),
                          teacher_variables=v2)
    assert np.isfinite(sum(float(x) for x in losses3.values()))
    # freshly chained: distill-cls against the stage-2 teacher is zero
    assert float(losses3['loss_dist_cls']) < 1e-8
