import time, sys
t0=time.time()
import jax, jax.numpy as jnp, numpy as np
from advanced_cpu_raytracing_tpu.render.renderer import (
    _camera_cached, _mega_build_cached, _mega_route, _render_image_mega,
    options_for_camera)
from advanced_cpu_raytracing_tpu.scene.pack import pack_scene
from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene
SCENE="/root/reference/archive/hw1_inputs/cornellbox_recursive_conductors.xml"
cfg=load_scene(SCENE); pack=pack_scene(cfg); cam_cfg=cfg.cameras[0]
opts=options_for_camera(cfg,cam_cfg)
w,h=cam_cfg.width,cam_cfg.height
print("load",time.time()-t0,flush=True)
cam=_camera_cached(cam_cfg)
mc,tab,ctab,img_tab=_mega_build_cached(pack,opts)
print("build",time.time()-t0,"host_rng",mc.host_rng,flush=True)
key=jax.random.PRNGKey(0); seed=jnp.int32(0)
jax.block_until_ready(key)
t1=time.time()
img=_render_image_mega(mc,tab,ctab,img_tab,cam,key,seed,4,False,w,h,True)
jax.block_until_ready(img)
print("compile+first frame (16spp)",time.time()-t1,flush=True)
t1=time.time()
img=_render_image_mega(mc,tab,ctab,img_tab,cam,key,seed,4,False,w,h,True)
jax.block_until_ready(img)
print("warm frame",time.time()-t1,flush=True)
t1=time.time()
imgs=[_render_image_mega(mc,tab,ctab,img_tab,cam,jax.random.PRNGKey(i),jnp.int32(i),4,False,w,h,True) for i in range(4)]
for im in imgs: im.copy_to_host_async()
for im in imgs: np.asarray(im)
print("pipeline4 per-frame",(time.time()-t1)/4,flush=True)
