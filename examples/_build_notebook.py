"""Build and execute examples/exploration.ipynb (the reference's src/vit.ipynb
equivalent surface — dataset browsing, fine-tune with recorded outputs,
attention maps/rollout, checkpoint interop). Run from the repo root:

    python examples/_build_notebook.py
"""

import nbformat as nbf
from nbclient import NotebookClient

nb = nbf.v4.new_notebook()
md = nbf.v4.new_markdown_cell
code = nbf.v4.new_code_cell

C = []

C.append(md(
    "# vitx exploration notebook\n\n"
    "The executed `src/vit.ipynb`-equivalent surface of the reference project "
    "(SiddhantSKarki/Vision-Transformer): dataset browsing (reference cells "
    "1-5, 18-24), an interactive fine-tune with recorded outputs (cell 28 — "
    "the source of the reference's only performance record), attention-map "
    "and rollout visualization, and checkpoint interop.\n\n"
    "Runs anywhere JAX runs: the synthetic grating dataset below is the "
    "no-egress stand-in for the brain-tumor folder set — swap in "
    "`FolderDataset('/path/to/brain-tumor')` for the real thing."))

C.append(code(
    "%matplotlib inline\n"
    "import jax, jax.numpy as jnp, numpy as np\n"
    "import matplotlib.pyplot as plt\n"
    "from vitx import (ViTConfig, get_config, init_params, forward,\n"
    "                  forward_with_attn, forward_with_rollout,\n"
    "                  attention_rollout)\n"
    "from vitx.data import BatchLoader, SyntheticDataset\n"
    "from vitx.data.pipeline import make_preprocess\n"
    "from vitx.train.loop import Trainer, TrainerConfig\n"
    "print('backend:', jax.default_backend(), '| devices:', len(jax.devices()))"))

C.append(md(
    "## 1. Dataset\n\n"
    "Four oriented-grating classes (stand-in for glioma/meningioma/"
    "none/pituitary). The loader pads ragged final batches to a static shape "
    "and carries a mask, so jit never recompiles and eval stays sample-exact."))

C.append(code(
    "cfg = get_config('tiny')          # 64x64, patch 8, 4 classes\n"
    "train_ds = SyntheticDataset(num_examples=512, image_size=cfg.image_size,\n"
    "                            num_classes=cfg.num_classes, noise=0.25)\n"
    "eval_ds  = SyntheticDataset(num_examples=128, image_size=cfg.image_size,\n"
    "                            num_classes=cfg.num_classes, noise=0.25, seed=1)\n"
    "counts = np.bincount(train_ds.labels, minlength=cfg.num_classes)\n"
    "for c, n in zip(train_ds.classes, counts):\n"
    "    print(f'{c}: {n} examples')"))

C.append(code(
    "fig, axes = plt.subplots(2, 6, figsize=(12, 4))\n"
    "for ax, i in zip(axes.ravel(), range(12)):\n"
    "    img, label = train_ds.get_example(i)\n"
    "    ax.imshow(img); ax.set_title(train_ds.classes[label], fontsize=8)\n"
    "    ax.axis('off')\n"
    "fig.suptitle('training examples'); fig.tight_layout(); plt.show()"))

C.append(md(
    "## 2. Device-resident preprocessing\n\n"
    "The host only decodes to uint8; scaling, normalization and the random "
    "flip run as ONE jitted function on the accelerator (the reference did "
    "all of this on the host with torchvision workers, train.py:151-162)."))

C.append(code(
    "pre = make_preprocess(out_size=None, mean=(0.5, 0.5, 0.5),\n"
    "                      std=(0.5, 0.5, 0.5))\n"
    "raw = np.stack([train_ds.get_example(i)[0] for i in range(8)])\n"
    "proc = pre(raw, jax.random.PRNGKey(0), train=True)\n"
    "print('uint8 in :', raw.shape, raw.dtype, 'range', raw.min(), '-', raw.max())\n"
    "print('float out:', proc.shape, proc.dtype,\n"
    "      'mean %.3f std %.3f' % (float(proc.mean()), float(proc.std())))"))

C.append(md(
    "## 3. Model\n\n"
    "Functional ViT: params are a plain pytree, the encoder is one "
    "`lax.scan` over stacked block params, attention runs the Pallas flash "
    "kernel on TPU (XLA reference path elsewhere)."))

C.append(code(
    "params = init_params(jax.random.PRNGKey(0), cfg)\n"
    "n_params = sum(x.size for x in jax.tree.leaves(params))\n"
    "logits = forward(params, proc, cfg)\n"
    "print(cfg)\n"
    "print(f'parameters: {n_params:,}')\n"
    "print('logits:', logits.shape, logits.dtype)"))

C.append(md(
    "## 4. Fine-tune\n\n"
    "The reference notebook's interactive training run (vit.ipynb cell 28) — "
    "here with per-epoch eval, TensorBoard-compatible scalars and per-epoch "
    "checkpoints with auto-resume."))

C.append(code(
    "import tempfile, pathlib\n"
    "workdir = pathlib.Path(tempfile.mkdtemp(prefix='vitx_nb_'))\n"
    "trainer = Trainer(cfg, TrainerConfig(\n"
    "    epochs=5, lr=3e-3, log_every=8,\n"
    "    checkpoint_dir=str(workdir / 'ckpt'), log_dir=str(workdir / 'logs')),\n"
    "    preprocess=pre)\n"
    "history = trainer.fit(\n"
    "    BatchLoader(train_ds, 64, shuffle=True, seed=0),\n"
    "    BatchLoader(eval_ds, 64))"))

C.append(code(
    "fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 3.2))\n"
    "epochs = [h['epoch'] for h in history]\n"
    "ax1.plot(epochs, [h['loss'] for h in history], 'o-', label='train (last batch)')\n"
    "ax1.plot(epochs, [h['val_loss'] for h in history], 's-', label='val')\n"
    "ax1.set_xlabel('epoch'); ax1.set_ylabel('loss'); ax1.legend(); ax1.grid(alpha=.3)\n"
    "ax2.plot(epochs, [h['val_accuracy'] for h in history], 'o-')\n"
    "ax2.set_xlabel('epoch'); ax2.set_ylabel('val accuracy'); ax2.grid(alpha=.3)\n"
    "fig.tight_layout(); plt.show()\n"
    "print('final val accuracy: %.3f' % history[-1]['val_accuracy'])"))

C.append(md(
    "## 5. Evaluation: confusion matrix and per-class metrics\n\n"
    "One confusion matrix accumulated on device over the loader (single host "
    "transfer), sklearn-parity weighted precision/recall "
    "(the reference computed these per-batch on host, train.py:29-44)."))

C.append(code(
    "metrics = trainer.evaluate(BatchLoader(eval_ds, 64))\n"
    "cm = np.asarray(metrics['confusion_matrix'])\n"
    "fig, ax = plt.subplots(figsize=(4, 3.5))\n"
    "im = ax.imshow(cm, cmap='Blues')\n"
    "for i in range(cm.shape[0]):\n"
    "    for j in range(cm.shape[1]):\n"
    "        ax.text(j, i, int(cm[i, j]), ha='center', va='center',\n"
    "                color='white' if cm[i, j] > cm.max()/2 else 'black')\n"
    "ax.set_xlabel('predicted'); ax.set_ylabel('true')\n"
    "ax.set_xticks(range(4), eval_ds.classes, rotation=45, fontsize=7)\n"
    "ax.set_yticks(range(4), eval_ds.classes, fontsize=7)\n"
    "fig.colorbar(im); fig.tight_layout(); plt.show()\n"
    "print('accuracy: %.3f' % metrics['accuracy'])\n"
    "print('precision (weighted): %.3f' % metrics['precision_weighted'])\n"
    "print('recall    (weighted): %.3f' % metrics['recall_weighted'])\n"
    "print('per-class accuracy:',\n"
    "      np.round(np.asarray(metrics['per_class_accuracy']), 3))"))

C.append(md(
    "## 6. Attention maps\n\n"
    "`forward_with_attn` returns per-layer, per-head probabilities — the "
    "public API for the reference's `attention_probs` stash "
    "(transformer.py:39,48). Below: where each head of the last layer looks "
    "from the CLS token."))

C.append(code(
    "imgs = np.stack([eval_ds.get_example(i)[0] for i in range(4)])\n"
    "x = pre(imgs, jax.random.PRNGKey(0), train=False)\n"
    "logits, probs = forward_with_attn(trainer.state.params, x, cfg)\n"
    "print('probs:', probs.shape, '(depth, B, H, T, T)')\n"
    "g = cfg.grid_size\n"
    "cls_attn = np.asarray(probs)[-1, 0, :, 0, 1:]      # last layer, image 0\n"
    "fig, axes = plt.subplots(1, cfg.num_heads + 1, figsize=(12, 2.6))\n"
    "axes[0].imshow(imgs[0]); axes[0].set_title('input', fontsize=8)\n"
    "for h in range(cfg.num_heads):\n"
    "    axes[h + 1].imshow(cls_attn[h].reshape(g, g), cmap='inferno')\n"
    "    axes[h + 1].set_title(f'head {h}', fontsize=8)\n"
    "for ax in axes: ax.axis('off')\n"
    "fig.suptitle('last-layer CLS attention per head'); fig.tight_layout(); plt.show()"))

C.append(md(
    "## 7. Attention rollout overlay\n\n"
    "`forward_with_rollout` accumulates the rollout product inside the "
    "encoder scan (the (depth, B, T, T) stack is never materialized) and "
    "matches the materialized `attention_rollout` path exactly."))

C.append(code(
    "logits_r, roll = forward_with_rollout(trainer.state.params, x, cfg)\n"
    "roll_mat = attention_rollout(np.asarray(probs).mean(2))\n"
    "print('fused vs materialized rollout max |diff|:',\n"
    "      float(np.max(np.abs(np.asarray(roll) - np.asarray(roll_mat)))))\n"
    "fig, axes = plt.subplots(2, 4, figsize=(10, 5))\n"
    "for i in range(4):\n"
    "    heat = np.asarray(roll)[i].reshape(g, g)\n"
    "    heat = np.kron(heat, np.ones((cfg.patch_size, cfg.patch_size)))\n"
    "    axes[0, i].imshow(imgs[i])\n"
    "    axes[0, i].set_title(eval_ds.classes[int(np.argmax(logits_r[i]))],\n"
    "                         fontsize=8)\n"
    "    axes[1, i].imshow(imgs[i]); axes[1, i].imshow(heat, cmap='inferno', alpha=0.55)\n"
    "    axes[0, i].axis('off'); axes[1, i].axis('off')\n"
    "fig.suptitle('attention rollout (bottom: overlay)'); fig.tight_layout(); plt.show()"))

C.append(md(
    "### Class-specific saliency (Grad-CAM)\n\n"
    "Rollout is class-agnostic — it shows where CLS looked. `grad_cam` "
    "(vitx/nn/saliency.py) shows what drove a PARTICULAR class's logit: "
    "gradients at the last block's input tokens (the head reads only CLS, "
    "so that block's attention is what routes patch evidence into it). "
    "Also served per request: `POST /explain?method=gradcam&class=K`."))

C.append(code(
    "from vitx import grad_cam\n"
    "cam, cam_logits = grad_cam(trainer.state.params, x, cfg)\n"
    "fig, axes = plt.subplots(2, 4, figsize=(10, 5))\n"
    "for i in range(4):\n"
    "    heat = np.asarray(cam)[i].reshape(g, g)\n"
    "    heat = np.kron(heat, np.ones((cfg.patch_size, cfg.patch_size)))\n"
    "    axes[0, i].imshow(imgs[i])\n"
    "    axes[0, i].set_title(\n"
    "        eval_ds.classes[int(np.argmax(cam_logits[i]))], fontsize=8)\n"
    "    axes[1, i].imshow(imgs[i]); axes[1, i].imshow(heat, cmap='inferno', alpha=0.55)\n"
    "    axes[0, i].axis('off'); axes[1, i].axis('off')\n"
    "fig.suptitle('grad-cam for the predicted class (bottom: overlay)')\n"
    "fig.tight_layout(); plt.show()"))

C.append(md(
    "## 8. Checkpoint interop with the reference\n\n"
    "Export reference-layout `{epoch}.pt` (exact state_dict keys, including "
    "the `emdeddings` misspelling and real AdamW optimizer state) and "
    "round-trip it back."))

C.append(code(
    "from vitx.train.checkpoint import save_reference_pt, load_reference_pt\n"
    "pt = workdir / '5.pt'\n"
    "host = jax.device_get(trainer.state)\n"
    "save_reference_pt(pt, host.params, cfg, epoch=5,\n"
    "                  opt_state=host.opt_state, batch_size=2)\n"
    "import warnings\n"
    "with warnings.catch_warnings():\n"
    "    warnings.simplefilter('ignore')   # corrected-semantics notice\n"
    "    params2, meta = load_reference_pt(pt, cfg)\n"
    "a = np.asarray(forward(host.params, x, cfg))\n"
    "b = np.asarray(forward(jax.tree.map(jnp.asarray, params2), x, cfg))\n"
    "print('epoch meta:', meta['epoch'], '| logits max |diff| after round-trip:',\n"
    "      float(np.max(np.abs(a - b))))"))

C.append(md(
    "## MAE self-supervised pretraining\n\n"
    "Beyond-reference capability: mask 75% of patches, reconstruct pixels "
    "(He et al. 2022), then fine-tune the encoder. The decoder here is tiny "
    "and the run short — enough to watch the reconstruction improve."))

C.append(code(
    "from vitx import MAEConfig, mae_forward\n"
    "from vitx.nn.mae import (create_mae_train_state, make_mae_train_step,\n"
    "                         unpatchify_pixels, mae_to_vit_params)\n"
    "from vitx.train.step import make_optimizer\n\n"
    "enc_cfg = get_config('tiny', compute_dtype='float32', final_norm=True)\n"
    "# norm_pix_loss=False: predictions stay in pixel space so the\n"
    "# reconstructions below render directly\n"
    "mcfg = MAEConfig(encoder=enc_cfg, decoder_dim=96, decoder_depth=2,\n"
    "                 decoder_heads=3, mask_ratio=0.75, norm_pix_loss=False)\n"
    "opt = make_optimizer(lr=3e-3)\n"
    "mstate = create_mae_train_state(jax.random.PRNGKey(0), mcfg, opt)\n"
    "mstep = make_mae_train_step(mcfg, opt)\n"
    "mb = next(iter(BatchLoader(train_ds, 64, shuffle=True)))\n"
    "imgs = pre(mb['image'], jax.random.PRNGKey(1), train=False)\n"
    "losses = []\n"
    "for i in range(120):\n"
    "    mstate, mm = mstep(mstate, {'image': imgs}, jax.random.PRNGKey(2))\n"
    "    losses.append(float(mm['loss']))\n"
    "plt.figure(figsize=(4, 2.5)); plt.plot(losses)\n"
    "plt.xlabel('step'); plt.ylabel('MAE loss'); plt.title('masked-patch "
    "reconstruction loss'); plt.show()\n"
    "print(f'loss {losses[0]:.3f} -> {losses[-1]:.3f}')"))

C.append(code(
    "# visualize: original | 75%-masked input | reconstruction\n"
    "loss, pred, mask = jax.jit(lambda p, x, r: mae_forward(p, x, mcfg, r,\n"
    "    deterministic=True))(mstate.params, imgs[:4], jax.random.PRNGKey(5))\n"
    "from vitx.nn.mae import patchify_pixels\n"
    "patches = patchify_pixels(imgs[:4], enc_cfg)\n"
    "vis_masked = patches * (1 - np.asarray(mask)[..., None])\n"
    "recon = np.asarray(pred) * np.asarray(mask)[..., None] + \\\n"
    "    np.asarray(patches) * (1 - np.asarray(mask)[..., None])\n"
    "fig, axes = plt.subplots(3, 4, figsize=(8, 6))\n"
    "rows = [np.asarray(imgs[:4]),\n"
    "        np.asarray(unpatchify_pixels(jnp.asarray(vis_masked), enc_cfg)),\n"
    "        np.asarray(unpatchify_pixels(jnp.asarray(recon), enc_cfg))]\n"
    "for r, (row, name) in enumerate(zip(rows, ['original', 'masked 75%',\n"
    "                                           'reconstruction'])):\n"
    "    for c in range(4):\n"
    "        axes[r, c].imshow(np.clip(row[c] * 0.5 + 0.5, 0, 1))\n"
    "        axes[r, c].axis('off')\n"
    "    axes[r, 0].set_ylabel(name)\n"
    "plt.tight_layout(); plt.show()"))

C.append(md(
    "## Device-resident training recipe: RandAugment, CutMix, erasing\n\n"
    "The DeiT-style recipe knobs, expressed TPU-natively (no per-sample "
    "host Python): each RandAugment round is ONE batched bilinear warp "
    "(the geometric ops are per-sample 2×3 affines) plus a masked "
    "elementwise chain (the color ops); CutMix is a per-pixel keep-weight "
    "map whose mean IS the exact target mixing ratio (pixel-exact λ); "
    "random erasing fills a random box with noise. All static-shape XLA, "
    "fused into the first device computation — CLI: `--randaug M "
    "--cutmix-alpha 1.0 --mixup-alpha 0.8 --random-erase p`."))

C.append(code(
    "from vitx.data.randaugment import rand_augment, random_erasing\n"
    "x01 = jnp.asarray(mb['image'][:4], jnp.float32)\n"
    "x01 = x01 / 255.0 if float(x01.max()) > 1.5 else x01\n"
    "fig, axes = plt.subplots(4, 4, figsize=(8, 8))\n"
    "axes[0, 0].set_ylabel('original')\n"
    "for c in range(4):\n"
    "    axes[0, c].imshow(np.asarray(x01)[c])\n"
    "for r, seed in enumerate([7, 8, 9], start=1):\n"
    "    aug = np.asarray(rand_augment(x01, jax.random.PRNGKey(seed),\n"
    "                                  num_layers=2, magnitude=9.0))\n"
    "    axes[r, 0].set_ylabel(f'randaug m9 #{r}')\n"
    "    for c in range(4):\n"
    "        axes[r, c].imshow(aug[c])\n"
    "for ax in axes.ravel():\n"
    "    ax.set_xticks([]); ax.set_yticks([])\n"
    "plt.suptitle('RandAugment: one batched warp + masked color chain per "
    "round'); plt.tight_layout(); plt.show()"))

C.append(code(
    "# CutMix: the keep-weight map's mean is the EXACT lambda used on the\n"
    "# targets (clipped boxes and all) — visualize the mixed batch\n"
    "from vitx.train.step import _mix_weight_map\n"
    "perm = jax.random.permutation(jax.random.PRNGKey(11), x01.shape[0])\n"
    "fig, axes = plt.subplots(1, 4, figsize=(8, 2.4))\n"
    "for i, seed in enumerate([3, 5, 6, 12]):\n"
    "    w = _mix_weight_map(jax.random.PRNGKey(seed), x01.shape,\n"
    "                        mixup_alpha=None, cutmix_alpha=1.0)\n"
    "    mixed = np.asarray(w * x01 + (1 - w) * x01[perm])\n"
    "    axes[i].imshow(mixed[0]); axes[i].axis('off')\n"
    "    axes[i].set_title(f'lam={float(jnp.mean(w)):.2f}', fontsize=9)\n"
    "plt.suptitle('CutMix with pixel-exact target reweighting')\n"
    "plt.tight_layout(); plt.show()\n"
    "erased = np.asarray(random_erasing(x01, jax.random.PRNGKey(4),\n"
    "                                   prob=1.0))\n"
    "fig, axes = plt.subplots(1, 4, figsize=(8, 2.2))\n"
    "for i in range(4):\n"
    "    axes[i].imshow(np.clip(erased[i], 0, 1)); axes[i].axis('off')\n"
    "plt.suptitle('random erasing (timm pixel mode)'); plt.tight_layout()\n"
    "plt.show()"))

C.append(code(
    "# warmup+cosine schedule (--schedule cosine). With --accum-steps k the\n"
    "# optimizer (optax.MultiSteps) ticks the schedule once per k\n"
    "# micro-batches, so the CLI sizes the horizon in UPDATES.\n"
    "from vitx.train.step import warmup_cosine\n"
    "sched = warmup_cosine(3e-3, total_steps=1000, warmup_steps=100)\n"
    "steps = np.arange(1000)\n"
    "plt.figure(figsize=(4.5, 2.2))\n"
    "plt.plot(steps, [float(sched(s)) for s in steps])\n"
    "plt.xlabel('optimizer update'); plt.ylabel('lr')\n"
    "plt.title('linear warmup -> cosine decay'); plt.tight_layout()\n"
    "plt.show()"))

C.append(md(
    "## Inference acceleration: ToMe token merging\n\n"
    "`cfg.tome_r` merges the r most similar patch-token pairs per block at "
    "inference (Bolya et al. 2023) — any trained checkpoint, no retraining. "
    "Static shapes throughout (compile-time r, one-hot-matmul scatter). "
    "Below: prediction agreement with the full model, and the paper's "
    "Fig.-5-style merged-region map via source tracking."))

C.append(code(
    "from vitx.nn.tome import encode_tome, tome_patch_assignment\n"
    "cfg_tome = cfg.replace(tome_r=6)   # 64 patches, depth 4 -> 40 left\n"
    "logits_full = np.asarray(forward(trainer.state.params, x, cfg))\n"
    "logits_tome = np.asarray(forward(trainer.state.params, x, cfg_tome))\n"
    "agree = (logits_full.argmax(-1) == logits_tome.argmax(-1)).mean()\n"
    "print(f'argmax agreement at r=6: {agree:.2%}')\n"
    "_, src = encode_tome(trainer.state.params, x[:4], cfg_tome,\n"
    "                     return_sources=True)\n"
    "owners = np.asarray(tome_patch_assignment(src, cfg_tome))\n"
    "fig, axes = plt.subplots(2, 4, figsize=(9, 4.5))\n"
    "for i in range(4):\n"
    "    axes[0, i].imshow(np.clip(np.asarray(x[i]) * 0.5 + 0.5, 0, 1))\n"
    "    axes[0, i].axis('off')\n"
    "    axes[1, i].imshow(owners[i], cmap='tab20'); axes[1, i].axis('off')\n"
    "axes[0, 0].set_title('input', fontsize=8)\n"
    "axes[1, 0].set_title('merged-token regions', fontsize=8)\n"
    "plt.tight_layout(); plt.show()"))

C.append(md(
    "## int8 weight-only artifacts\n\n"
    "`vitx/quant.py`: symmetric per-output-channel int8 for every matmul "
    "weight — ~4x smaller than fp32 on disk, served directly by "
    "`load_server`. Embeddings/norms stay float; quality cost is the "
    "standard weight-only-int8 regime."))

C.append(code(
    "import os, tempfile\n"
    "from vitx.quant import save_quantized, load_quantized, "
    "quantization_error\n"
    "art = os.path.join(tempfile.mkdtemp(), 'model.quant.npz')\n"
    "save_quantized(art, trainer.state.params)\n"
    "fp32_bytes = sum(np.asarray(l).nbytes\n"
    "                 for l in jax.tree.leaves(trainer.state.params))\n"
    "print(f'artifact: {os.path.getsize(art)/1e6:.2f} MB vs '\n"
    "      f'{fp32_bytes/1e6:.2f} MB fp32 '\n"
    "      f'({fp32_bytes/os.path.getsize(art):.1f}x smaller)')\n"
    "qparams, _ = load_quantized(art, init_params(jax.random.PRNGKey(1), cfg))\n"
    "logits_q = np.asarray(forward(qparams, x, cfg))\n"
    "print('argmax agreement:',\n"
    "      (logits_q.argmax(-1) == logits_full.argmax(-1)).mean())\n"
    "worst = max(quantization_error(trainer.state.params).items(),\n"
    "            key=lambda kv: kv[1])\n"
    "print(f'worst per-leaf relative error: {worst[1]:.4f} ({worst[0]})')"))

C.append(md(
    "The artifact dequantizes to float at load: a resident-int8 runtime "
    "encoder was chip-measured slower than the float path at every "
    "reachable shape (ViT-B b1/4/8 and ViT-L@384 b1/2/4 — the fused "
    "MHA/MLP kernels fuse the seams an int8 path pays separately), so "
    "int8 is a *storage* format here, not a compute path."))

C.append(md(
    "## Feature space\n\n"
    "The backbone as a feature extractor (`forward_features`, CLS pooling): "
    "a 2-D PCA of the eval-set embeddings separates the classes the head "
    "never sees here, and the frozen-feature protocols (closed-form linear "
    "probe, DINO-style cosine k-NN — `python -m vitx.cli.probe`) put a "
    "number on representation quality independent of the classifier head."))

C.append(code(
    "from vitx.cli.probe import extract_features, fit_linear_probe, knn_predict\n"
    "tx, ty = extract_features(trainer.state.params, train_ds, cfg)\n"
    "vx, vy = extract_features(trainer.state.params, eval_ds, cfg)\n"
    "probe = fit_linear_probe(tx, ty, cfg.num_classes)\n"
    "knn = knn_predict(tx, ty, vx, cfg.num_classes, k=20)\n"
    "print('linear-probe val acc:', float((probe(vx) == vy).mean()))\n"
    "print('k-NN (k=20)  val acc:', float((knn == vy).mean()))\n"
    "# 2-D PCA of the eval features\n"
    "centered = vx - vx.mean(axis=0)\n"
    "_, _, vt = np.linalg.svd(centered, full_matrices=False)\n"
    "z = centered @ vt[:2].T\n"
    "fig, ax = plt.subplots(figsize=(5, 4))\n"
    "for c in range(cfg.num_classes):\n"
    "    ax.scatter(z[vy == c, 0], z[vy == c, 1], s=12, alpha=0.7,\n"
    "               label=eval_ds.classes[c])\n"
    "ax.set_xlabel('PC 1'); ax.set_ylabel('PC 2')\n"
    "ax.set_title('CLS features, eval set (PCA)'); ax.legend(fontsize=8)\n"
    "fig.tight_layout(); plt.show()"))

C.append(md(
    "## FlexiViT: one checkpoint, any patch size\n\n"
    "PI-resize (Beyer et al. 2023): the patchify kernel is pseudo-inverse-"
    "resized so the SAME fine-tuned weights run at a different patch size "
    "(each operating point its own static-shape XLA program). Upsampling "
    "preserves token values exactly on correspondingly-resized patches — "
    "below, predictions agree between the original model and its 2× "
    "patch-size resize. CLI: `vitx.cli.eval --patch-size P`, and "
    "`--init-from` transfers across patch sizes the same way."))

C.append(code(
    "from vitx.nn.flexivit import resize_patch_embed\n"
    "P = cfg.patch_size\n"
    "params2, cfg2 = resize_patch_embed(trainer.state.params, cfg,\n"
    "                                   patch_size=2 * P)\n"
    "print(f'patch {P} -> {cfg2.patch_size}, input {cfg.image_size} -> '\n"
    "      f'{cfg2.image_size}px, grid {cfg2.grid_size} (unchanged)')\n"
    "xb = pre(np.stack([eval_ds.get_example(i)[0] for i in range(64)]),\n"
    "         jax.random.PRNGKey(0), train=False)\n"
    "B, H, W, Cc = xb.shape; g = H // P\n"
    "xp = xb.reshape(B, g, P, g, P, Cc).transpose(0, 1, 3, 2, 4, 5)\n"
    "xp = xp.reshape(B * g * g, P, P, Cc)\n"
    "xp = jax.vmap(lambda t: jax.image.resize(t, (2*P, 2*P, Cc),\n"
    "                                         'bilinear'))(xp)\n"
    "xp = xp.reshape(B, g, g, 2*P, 2*P, Cc).transpose(0, 1, 3, 2, 4, 5)\n"
    "xp = xp.reshape(B, g*2*P, g*2*P, Cc)\n"
    "pred1 = np.asarray(forward(trainer.state.params, xb, cfg)).argmax(-1)\n"
    "pred2 = np.asarray(forward(params2, xp, cfg2)).argmax(-1)\n"
    "print(f'prediction agreement at 2x patch size: '\n"
    "      f'{float((pred1 == pred2).mean()):.3f}')"))

C.append(md(
    "## Pointers\n\n"
    "- `examples/quickstart.py` — the 30-second training script\n"
    "- `examples/attention_rollout.py` — rollout overlay as a CLI\n"
    "- `python -m vitx.cli.train / .eval / .bench / .pretrain / .serve / "
    ".probe` — full CLIs\n"
    "- `POST /explain` on the serve CLI — top-k + rollout heatmap per image\n"
    "- `vitx.cli.pretrain --export-vit` → `vitx.cli.train --init-from` — "
    "the MAE pretrain→fine-tune loop at CLI scale\n"
    "- `vitx/parallel` — the same Trainer scaled over a `jax.sharding.Mesh` "
    "(pass `mesh=make_mesh(dp=..., tp=...)`)\n"
    "- `python -m vitx.cli.tune` — batch×remat×unroll throughput sweep on "
    "the current device\n"
    "- `vitx.data.write_shards` / `--data shards:<dir>` — tar-shard IO for "
    "production-scale datasets\n"
    "- `--layerscale 1e-5` (CaiT), `--qk-norm` (ViT-22B) — deep/large-model "
    "training stability knobs"))

nb["cells"] = C
nb["metadata"]["kernelspec"] = {
    "display_name": "Python 3", "language": "python", "name": "python3"}

client = NotebookClient(nb, timeout=1200, kernel_name="python3")
client.execute()
nbf.write(nb, "examples/exploration.ipynb")
print("executed and wrote examples/exploration.ipynb")
