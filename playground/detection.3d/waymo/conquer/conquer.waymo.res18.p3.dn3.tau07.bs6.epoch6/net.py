"""ConQueR experiment model builder."""

import importlib.util
import os
import sys

from efg_tpu.models import conquer as CQ

# reuse the sibling Voxel-DETR experiment's config → kwargs helpers
_vd_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "voxeldetr.waymo.res18.p3.bs6.epoch6")
_spec = importlib.util.spec_from_file_location("voxeldetr_net", os.path.join(_vd_dir, "net.py"))
_vd_net = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_vd_net)


def build_model(config):
    cfg = _vd_net.model_cfg(config)
    cfg["dn"] = dict(config.model.dn)
    cfg["contrastive"] = dict(config.model.contrastive)
    return CQ.make_model_def(_vd_net.detr_kwargs(config), cfg)
