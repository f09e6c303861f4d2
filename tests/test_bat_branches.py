"""BAT's use_search_bc / use_search_feature branches.

Dead code in the reference (they reference undefined `self.K`,
xcorr.py:92,95, and ship disabled in every config); implemented correctly
here, so they must run and change the xcorr input width.
"""

import jax
import numpy as np

from open3dsot_tpu.config import make_config
from open3dsot_tpu.models import get_model


def bat_cfg(**over):
    base = dict(
        net_model="bat",
        template_size=32,
        search_size=64,
        feature_channel=16,
        hidden_channel=16,
        out_channel=16,
        vote_channel=16,
        num_proposal=8,
        k=4,
        bc_channel=9,
        use_fps=True,
        normalize_xyz=False,
        box_aware=True,
        degrees=True,
        use_z=False,
        limit_box=False,
        use_search_bc=False,
        use_search_feature=False,
    )
    base.update(over)
    return make_config(base)


class TestBATSearchBranches:
    def _run(self, cfg):
        model = get_model("bat")(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        out = model.apply(variables, model.dummy_batch(2), train=False)
        return variables, out

    def test_use_search_bc(self):
        cfg = bat_cfg(use_search_bc=True)
        variables, out = self._run(cfg)
        assert out["estimation_boxes"].shape == (2, 8, 5)
        # xcorr first layer consumes the extra 9 bc channels
        k = variables["params"]["xcorr"]["mlp"]["layer0"]["dense"]["kernel"]
        assert k.shape[0] == 16 + 3 + 9 + 9

    def test_use_search_feature(self):
        cfg = bat_cfg(use_search_feature=True)
        variables, out = self._run(cfg)
        k = variables["params"]["xcorr"]["mlp"]["layer0"]["dense"]["kernel"]
        assert k.shape[0] == 16 + 3 + 9 + 16

    def test_both(self):
        cfg = bat_cfg(use_search_bc=True, use_search_feature=True)
        variables, out = self._run(cfg)
        k = variables["params"]["xcorr"]["mlp"]["layer0"]["dense"]["kernel"]
        assert k.shape[0] == 16 + 3 + 9 + 9 + 16
        assert np.all(np.isfinite(np.asarray(out["estimation_boxes"])))
