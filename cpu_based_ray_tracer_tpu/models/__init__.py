"""Per-stage renderers mirroring the reference's seven evolution stages.

=================  ==========================================================
Module             Reference stage (dir under /root/reference)
=================  ==========================================================
``offline``        ``offline prototype/`` — RTIOW scatter integrator -> PPM
``initial``        ``initial framework/`` — toy energy-halving reflect loop
``nppt``           ``non physical path tracer/`` — RTIOW materials in the GUI
``whitted``        ``Whitted Style Ray Tracer/`` — recursion w/ exact Fresnel
``mesh``           ``BVH Ray Tracer/`` — triangle meshes + BVH
``monte_carlo``    ``Monte Carlo Path Tracer/`` — MC + NEE + Russian roulette
``denoiser``       ``Denoiser/`` — 1 SPP G-buffer + spatial/temporal denoise
=================  ==========================================================

Unlike the reference (seven diverging copy-pastes), every renderer here is a
pure function over the shared ``Scene``/``Materials``/camera types.
"""
