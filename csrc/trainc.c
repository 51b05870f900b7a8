/* trainc — complete TRAINING step in C: forward, cross-entropy, full
 * backward (head, MLP, attention, LayerNorms, patchify), and an AdamW
 * update — the csrc/train.c the reference README advertises (README.md:58)
 * but never shipped. Written from the vitx spec (vitx/train/step.py
 * semantics); verified against the vitx/JAX training trajectory in
 * tests/test_c_oracle.py.
 *
 * Usage: trainc model.bin data.bin steps lr weight_decay out_model.bin
 *   model.bin:  same format as vitc (vitx/interop/cbin.py)
 *   data.bin:   int32 B, int32 labels[B], fp32 images[B,S,S,C] (NHWC)
 *   stdout:     one "step %d loss %.6f" line per step
 *   out_model:  updated params in the same model.bin format
 *
 * Gradient accumulation is per-image into fp32 grad arenas (mean over the
 * batch), AdamW matches optax.adamw / torch.optim.AdamW semantics:
 * decoupled weight decay, bias-corrected moments, eps outside the sqrt.
 *
 * Build: gcc -O2 -o trainc trainc.c -lm   (add -fopenmp -DOMP for OpenMP)
 */

#include "vitc_core.h"

typedef struct {
    /* per-layer activation caches for one image (all arena views) */
    float *x_in;   /* (L+1, T, E): block inputs; slot L = encoder output */
    float *h1;     /* (L, T, E)  LN1 output */
    float *qkv;    /* (L, T, 3E) */
    float *probs;  /* (L, H, T, T) attention probabilities */
    float *ao;     /* (L, T, E)  concat head outputs */
    float *x_mid;  /* (L, T, E)  after attention residual */
    float *h2;     /* (L, T, E)  LN2 output */
    float *mlp_pre;/* (L, T, M) */
    float *mlp_act;/* (L, T, M) */
    float *head_h; /* (4E) pre-act */
    float *head_a; /* (4E) post-act */
    float *head_n; /* (4E) post-LN */
    float *arena;
} Acts;

static size_t acts_count(const Config *c) {
    size_t T = c->tokens, E = c->embed, L = c->depth, M = c->mlp_dim;
    size_t H = c->heads;
    return (L + 1) * T * E + L * T * E + L * T * 3 * E + L * H * T * T
         + 3 * L * T * E + 2 * L * T * M + 3 * 4 * E;
}

static void acts_carve(Acts *a, const Config *c) {
    size_t T = c->tokens, E = c->embed, L = c->depth, M = c->mlp_dim;
    size_t H = c->heads;
    float *p = a->arena;
    a->x_in = p;    p += (L + 1) * T * E;
    a->h1 = p;      p += L * T * E;
    a->qkv = p;     p += L * T * 3 * E;
    a->probs = p;   p += L * H * T * T;
    a->ao = p;      p += L * T * E;
    a->x_mid = p;   p += L * T * E;
    a->h2 = p;      p += L * T * E;
    a->mlp_pre = p; p += L * T * M;
    a->mlp_act = p; p += L * T * M;
    a->head_h = p;  p += 4 * E;
    a->head_a = p;  p += 4 * E;
    a->head_n = p;  p += 4 * E;
}

static float gelu_grad(float x) {
    /* d/dx [x * Phi(x)] = Phi(x) + x * phi(x), phi = N(0,1) pdf */
    float phi = expf(-0.5f * x * x) * 0.3989422804014327f;
    float Phi = 0.5f * (1.0f + erff(x * 0.70710678118654752f));
    return Phi + x * phi;
}

/* dx += dy @ w^T ; dw += x^T dy ; db += colsum(dy)   (dx/db may be NULL) */
static void matmul_bwd(const float *x, const float *w, const float *dy,
                       float *dx, float *dw, float *db, int rows, int k,
                       int n) {
    for (int r = 0; r < rows; r++) {
        const float *dyr = dy + (size_t)r * n;
        const float *xr = x + (size_t)r * k;
        if (dx) {
            float *dxr = dx + (size_t)r * k;
            for (int i = 0; i < k; i++) {
                const float *wr = w + (size_t)i * n;
                float acc = 0.f;
                for (int j = 0; j < n; j++) acc += dyr[j] * wr[j];
                dxr[i] += acc;
            }
        }
        for (int i = 0; i < k; i++) {
            float xi = xr[i];
            float *dwr = dw + (size_t)i * n;
            for (int j = 0; j < n; j++) dwr[j] += xi * dyr[j];
        }
        if (db)
            for (int j = 0; j < n; j++) db[j] += dyr[j];
    }
}

/* LayerNorm backward. x: input rows; dy: upstream; dx += ; ds/db += */
static void layer_norm_bwd(const float *x, const float *scale,
                           const float *dy, float *dx, float *dscale,
                           float *dbias, int rows, int dim) {
    for (int r = 0; r < rows; r++) {
        const float *row = x + (size_t)r * dim;
        const float *dyr = dy + (size_t)r * dim;
        float mean = 0.f, var = 0.f;
        for (int i = 0; i < dim; i++) mean += row[i];
        mean /= dim;
        for (int i = 0; i < dim; i++) {
            float d = row[i] - mean;
            var += d * d;
        }
        var /= dim;
        float inv = 1.0f / sqrtf(var + 1e-5f);
        float sum_dyg = 0.f, sum_dyg_xhat = 0.f;
        for (int i = 0; i < dim; i++) {
            float xhat = (row[i] - mean) * inv;
            float dyg = dyr[i] * scale[i];
            sum_dyg += dyg;
            sum_dyg_xhat += dyg * xhat;
            dscale[i] += dyr[i] * xhat;
            dbias[i] += dyr[i];
        }
        float *dxr = dx + (size_t)r * dim;
        for (int i = 0; i < dim; i++) {
            float xhat = (row[i] - mean) * inv;
            float dyg = dyr[i] * scale[i];
            dxr[i] += inv * (dyg - sum_dyg / dim - xhat * sum_dyg_xhat / dim);
        }
    }
}

/* forward for training: same math as forward_one but caches activations */
static void forward_train(const Config *c, const Params *p,
                          const float *image, float *logits, Acts *a) {
    int T = c->tokens, E = c->embed, H = c->heads, D = c->head_dim;
    int M = c->mlp_dim, P = c->patch_size, g = c->grid, C = c->channels;
    int S = c->image_size;
    float *x = a->x_in;                /* layer-0 input */

    for (int n = 0; n < c->patches; n++)
        for (int e = 0; e < E; e++) {
            int gr = n / g, gc = n % g;
            float acc = p->patch_bias[e];
            for (int pr = 0; pr < P; pr++)
                for (int pc = 0; pc < P; pc++)
                    for (int ch = 0; ch < C; ch++) {
                        int iy = gr * P + pr, ix = gc * P + pc;
                        float px = image[((size_t)iy * S + ix) * C + ch];
                        size_t widx = ((size_t)(pr * P + pc) * C + ch) * E + e;
                        acc += px * p->patch_kernel[widx];
                    }
            x[(size_t)(n + 1) * E + e] = acc;
        }
    memcpy(x, p->cls, sizeof(float) * E);
    for (int t = 0; t < T; t++)
        for (int e = 0; e < E; e++)
            x[(size_t)t * E + e] += p->pos[(size_t)t * E + e];

    float scale = 1.0f / sqrtf((float)D);
    for (int l = 0; l < c->depth; l++) {
        size_t le = (size_t)l * E;
        const float *xin = a->x_in + (size_t)l * T * E;
        float *h1 = a->h1 + (size_t)l * T * E;
        float *qkv = a->qkv + (size_t)l * T * 3 * E;
        float *ao = a->ao + (size_t)l * T * E;
        float *xmid = a->x_mid + (size_t)l * T * E;

        layer_norm(xin, h1, p->ln1_s + le, p->ln1_b + le, T, E);
        matmul(h1, p->wqkv + (size_t)l * E * 3 * E, NULL, qkv, T, E, 3 * E);
        for (int hh = 0; hh < H; hh++) {
            float *pr = a->probs
                + (((size_t)l * H + hh) * T) * T;
            for (int i = 0; i < T; i++)
                for (int j = 0; j < T; j++) {
                    const float *qi = qkv + (size_t)i * 3 * E + (size_t)hh * D;
                    const float *kj = qkv + (size_t)j * 3 * E + E
                                      + (size_t)hh * D;
                    float s = 0.f;
                    for (int d = 0; d < D; d++) s += qi[d] * kj[d];
                    pr[(size_t)i * T + j] = s * scale;
                }
            softmax_rows(pr, T, T);
            for (int i = 0; i < T; i++) {
                float *o = ao + (size_t)i * E + (size_t)hh * D;
                for (int d = 0; d < D; d++) o[d] = 0.f;
                for (int j = 0; j < T; j++) {
                    float w = pr[(size_t)i * T + j];
                    const float *vj = qkv + (size_t)j * 3 * E + 2 * E
                                      + (size_t)hh * D;
                    for (int d = 0; d < D; d++) o[d] += w * vj[d];
                }
            }
        }
        /* proj into xmid then add residual */
        matmul(ao, p->wo + (size_t)l * E * E, p->bo + le, xmid, T, E, E);
        for (size_t i = 0; i < (size_t)T * E; i++) xmid[i] += xin[i];

        float *h2 = a->h2 + (size_t)l * T * E;
        float *pre = a->mlp_pre + (size_t)l * T * M;
        float *act = a->mlp_act + (size_t)l * T * M;
        float *xout = a->x_in + (size_t)(l + 1) * T * E;
        layer_norm(xmid, h2, p->ln2_s + le, p->ln2_b + le, T, E);
        matmul(h2, p->w1 + (size_t)l * E * M, p->b1 + (size_t)l * M,
               pre, T, E, M);
        if (c->act == 1) {
            for (size_t i = 0; i < (size_t)T * M; i++)
                act[i] = pre[i] > 0 ? pre[i] : 0.f;
        } else {
            for (size_t i = 0; i < (size_t)T * M; i++)
                act[i] = gelu_erf(pre[i]);
        }
        matmul(act, p->w2 + (size_t)l * M * E, p->b2 + le, xout, T, M, E);
        for (size_t i = 0; i < (size_t)T * E; i++) xout[i] += xmid[i];
    }

    int E4 = 4 * E;
    const float *xf = a->x_in + (size_t)c->depth * T * E;   /* CLS row 0 */
    matmul(xf, p->hw1, p->hb1, a->head_h, 1, E, E4);
    for (int i = 0; i < E4; i++) a->head_a[i] = gelu_erf(a->head_h[i]);
    layer_norm(a->head_a, a->head_n, p->hln_s, p->hln_b, 1, E4);
    matmul(a->head_n, p->hw2, p->hb2, logits, 1, E4, c->classes);
}

/* backward for one image; dlogits: (classes,); grads accumulated into gp */
static void backward_one(const Config *c, const Params *p, const Params *gp,
                         const float *image, const Acts *a,
                         const float *dlogits, float *scratch) {
    int T = c->tokens, E = c->embed, H = c->heads, D = c->head_dim;
    int M = c->mlp_dim, P = c->patch_size, g = c->grid, C = c->channels;
    int S = c->image_size, E4 = 4 * E;

    /* scratch: dx (T,E) | buf1 (T,E) | buf2 (T,3E) | buf3 (T,M) | datt (T,T)
       | hbuf (3*4E) */
    float *dx = scratch;
    float *buf1 = dx + (size_t)T * E;
    float *buf2 = buf1 + (size_t)T * E;
    float *buf3 = buf2 + (size_t)T * 3 * E;
    float *datt = buf3 + (size_t)T * M;
    float *hbuf = datt + (size_t)T * T;
    memset(dx, 0, sizeof(float) * (size_t)T * E);

    /* --- head --- */
    float *dn = hbuf;                /* (E4) */
    float *da = hbuf + E4;           /* (E4) */
    float *dh = hbuf + 2 * E4;       /* (E4) */
    memset(dn, 0, sizeof(float) * 3 * E4);
    matmul_bwd(a->head_n, p->hw2, dlogits, dn, gp->hw2, gp->hb2,
               1, E4, c->classes);
    layer_norm_bwd(a->head_a, p->hln_s, dn, da, gp->hln_s, gp->hln_b, 1, E4);
    for (int i = 0; i < E4; i++) dh[i] = da[i] * gelu_grad(a->head_h[i]);
    const float *xf = a->x_in + (size_t)c->depth * T * E;
    matmul_bwd(xf, p->hw1, dh, dx, gp->hw1, gp->hb1, 1, E, E4);

    float scale = 1.0f / sqrtf((float)D);
    for (int l = c->depth - 1; l >= 0; l--) {
        size_t le = (size_t)l * E;
        const float *xin = a->x_in + (size_t)l * T * E;
        const float *xmid = a->x_mid + (size_t)l * T * E;
        const float *h1 = a->h1 + (size_t)l * T * E;
        const float *h2 = a->h2 + (size_t)l * T * E;
        const float *qkv = a->qkv + (size_t)l * T * 3 * E;
        const float *ao = a->ao + (size_t)l * T * E;
        const float *pre = a->mlp_pre + (size_t)l * T * M;
        const float *act = a->mlp_act + (size_t)l * T * M;

        /* --- mlp backward: xout = xmid + W2(act(W1 h2 + b1)) + b2 --- */
        float *dact = buf3;                            /* (T, M) */
        memset(dact, 0, sizeof(float) * (size_t)T * M);
        matmul_bwd(act, p->w2 + (size_t)l * M * E, dx, dact,
                   gp->w2 + (size_t)l * M * E, gp->b2 + le, T, M, E);
        if (c->act == 1) {
            for (size_t i = 0; i < (size_t)T * M; i++)
                if (pre[i] <= 0) dact[i] = 0.f;
        } else {
            for (size_t i = 0; i < (size_t)T * M; i++)
                dact[i] *= gelu_grad(pre[i]);
        }
        float *dh2 = buf1;                             /* (T, E) */
        memset(dh2, 0, sizeof(float) * (size_t)T * E);
        matmul_bwd(h2, p->w1 + (size_t)l * E * M, dact, dh2,
                   gp->w1 + (size_t)l * E * M, gp->b1 + (size_t)l * M,
                   T, E, M);
        /* dx(residual) stays; add LN2 backward into dx */
        layer_norm_bwd(xmid, p->ln2_s + le, dh2, dx,
                       gp->ln2_s + le, gp->ln2_b + le, T, E);

        /* --- attention backward: xmid = xin + Wo(concat heads) + bo --- */
        float *dao = buf1;                             /* (T, E) */
        memset(dao, 0, sizeof(float) * (size_t)T * E);
        matmul_bwd(ao, p->wo + (size_t)l * E * E, dx, dao,
                   gp->wo + (size_t)l * E * E, gp->bo + le, T, E, E);
        float *dqkv = buf2;                            /* (T, 3E) */
        memset(dqkv, 0, sizeof(float) * (size_t)T * 3 * E);
        for (int hh = 0; hh < H; hh++) {
            const float *pr = a->probs + (((size_t)l * H + hh) * T) * T;
            /* dP = dAO_h V^T ; dV = P^T dAO_h */
            for (int i = 0; i < T; i++) {
                const float *daoi = dao + (size_t)i * E + (size_t)hh * D;
                for (int j = 0; j < T; j++) {
                    const float *vj = qkv + (size_t)j * 3 * E + 2 * E
                                      + (size_t)hh * D;
                    float acc = 0.f;
                    for (int d = 0; d < D; d++) acc += daoi[d] * vj[d];
                    datt[(size_t)i * T + j] = acc;
                }
            }
            for (int j = 0; j < T; j++) {
                float *dvj = dqkv + (size_t)j * 3 * E + 2 * E
                             + (size_t)hh * D;
                for (int i = 0; i < T; i++) {
                    float w = pr[(size_t)i * T + j];
                    const float *daoi = dao + (size_t)i * E + (size_t)hh * D;
                    for (int d = 0; d < D; d++) dvj[d] += w * daoi[d];
                }
            }
            /* softmax bwd in place: dS = P*(dP - rowsum(dP*P)) */
            for (int i = 0; i < T; i++) {
                float *dri = datt + (size_t)i * T;
                const float *pri = pr + (size_t)i * T;
                float dot = 0.f;
                for (int j = 0; j < T; j++) dot += dri[j] * pri[j];
                for (int j = 0; j < T; j++)
                    dri[j] = pri[j] * (dri[j] - dot);
            }
            /* dQ = scale dS K ; dK = scale dS^T Q */
            for (int i = 0; i < T; i++) {
                float *dqi = dqkv + (size_t)i * 3 * E + (size_t)hh * D;
                const float *dri = datt + (size_t)i * T;
                for (int j = 0; j < T; j++) {
                    const float *kj = qkv + (size_t)j * 3 * E + E
                                      + (size_t)hh * D;
                    float w = dri[j] * scale;
                    for (int d = 0; d < D; d++) dqi[d] += w * kj[d];
                }
            }
            for (int j = 0; j < T; j++) {
                float *dkj = dqkv + (size_t)j * 3 * E + E + (size_t)hh * D;
                for (int i = 0; i < T; i++) {
                    const float *qi = qkv + (size_t)i * 3 * E
                                      + (size_t)hh * D;
                    float w = datt[(size_t)i * T + j] * scale;
                    for (int d = 0; d < D; d++) dkj[d] += w * qi[d];
                }
            }
        }
        /* through the qkv projection and LN1 into dx */
        float *dh1 = dao;                               /* reuse (T, E) */
        memset(dh1, 0, sizeof(float) * (size_t)T * E);
        matmul_bwd(h1, p->wqkv + (size_t)l * E * 3 * E, dqkv, dh1,
                   gp->wqkv + (size_t)l * E * 3 * E, NULL, T, E, 3 * E);
        layer_norm_bwd(xin, p->ln1_s + le, dh1, dx,
                       gp->ln1_s + le, gp->ln1_b + le, T, E);
    }

    /* --- embeddings --- */
    for (int e = 0; e < E; e++) gp->cls[e] += dx[e];
    for (int t = 0; t < T; t++)
        for (int e = 0; e < E; e++)
            gp->pos[(size_t)t * E + e] += dx[(size_t)t * E + e];
    for (int n = 0; n < c->patches; n++) {
        const float *dxn = dx + (size_t)(n + 1) * E;
        int gr = n / g, gc = n % g;
        for (int pr = 0; pr < P; pr++)
            for (int pc = 0; pc < P; pc++)
                for (int ch = 0; ch < C; ch++) {
                    int iy = gr * P + pr, ix = gc * P + pc;
                    float px = image[((size_t)iy * S + ix) * C + ch];
                    float *dwrow = gp->patch_kernel
                        + ((size_t)(pr * P + pc) * C + ch) * E;
                    for (int e = 0; e < E; e++) dwrow[e] += px * dxn[e];
                }
        for (int e = 0; e < E; e++) gp->patch_bias[e] += dxn[e];
    }
}

int main(int argc, char **argv) {
    if (argc != 7) {
        fprintf(stderr,
                "usage: %s model.bin data.bin steps lr wd out_model.bin\n",
                argv[0]);
        return 2;
    }
    int steps = atoi(argv[3]);
    float lr = (float)atof(argv[4]);
    float wd = (float)atof(argv[5]);

    FILE *mf = fopen(argv[1], "rb");
    if (!mf) { perror(argv[1]); return 1; }
    int header[11];
    read_exact(header, sizeof(header), mf, "header");
    if (header[0] != MAGIC || header[1] != 1) {
        fprintf(stderr, "bad magic/version\n");
        return 1;
    }
    Config c = {0};
    c.image_size = header[2]; c.patch_size = header[3];
    c.channels = header[4]; c.classes = header[5];
    c.embed = header[6]; c.depth = header[7]; c.heads = header[8];
    c.mlp_ratio = header[9]; c.act = header[10];
    c.grid = c.image_size / c.patch_size;
    c.patches = c.grid * c.grid;
    c.tokens = c.patches + 1;
    c.head_dim = c.embed / c.heads;
    c.mlp_dim = c.embed * c.mlp_ratio;

    Params p = {0};
    p.n_params = param_count(&c);
    p.arena = xmalloc(p.n_params * sizeof(float));
    read_exact(p.arena, p.n_params * sizeof(float), mf, "params");
    fclose(mf);
    carve(&p, &c);

    /* grads + adam moments: same carve over their own arenas */
    Params gp = {0}, mu = {0}, nu = {0};
    gp.n_params = mu.n_params = nu.n_params = p.n_params;
    gp.arena = xmalloc(p.n_params * sizeof(float));
    mu.arena = xmalloc(p.n_params * sizeof(float));
    nu.arena = xmalloc(p.n_params * sizeof(float));
    memset(mu.arena, 0, p.n_params * sizeof(float));
    memset(nu.arena, 0, p.n_params * sizeof(float));
    carve(&gp, &c); carve(&mu, &c); carve(&nu, &c);

    FILE *inf = fopen(argv[2], "rb");
    if (!inf) { perror(argv[2]); return 1; }
    int B;
    read_exact(&B, sizeof(B), inf, "batch");
    int *labels = xmalloc(sizeof(int) * B);
    read_exact(labels, sizeof(int) * B, inf, "labels");
    size_t img_sz = (size_t)c.image_size * c.image_size * c.channels;
    float *images = xmalloc(sizeof(float) * B * img_sz);
    read_exact(images, sizeof(float) * B * img_sz, inf, "images");
    fclose(inf);

    Acts a = {0};
    a.arena = xmalloc(sizeof(float) * acts_count(&c));
    acts_carve(&a, &c);
    size_t T = c.tokens, E = c.embed, M = c.mlp_dim;
    size_t sc = 2 * T * E + T * 3 * E + T * M + T * T + 3 * 4 * E;
    float *scratch = xmalloc(sizeof(float) * sc);
    float *logits = xmalloc(sizeof(float) * c.classes);
    float *dlogits = xmalloc(sizeof(float) * c.classes);
    float *probs_out = xmalloc(sizeof(float) * c.classes);

    const float b1 = 0.9f, b2 = 0.999f, eps = 1e-8f;
    for (int s = 1; s <= steps; s++) {
        memset(gp.arena, 0, p.n_params * sizeof(float));
        double loss = 0.0;
        for (int b = 0; b < B; b++) {
            const float *img = images + (size_t)b * img_sz;
            forward_train(&c, &p, img, logits, &a);
            /* CE: mean over batch; dlogits = (softmax - onehot)/B */
            float m = logits[0];
            for (int k = 1; k < c.classes; k++)
                if (logits[k] > m) m = logits[k];
            float sum = 0.f;
            for (int k = 0; k < c.classes; k++) {
                probs_out[k] = expf(logits[k] - m);
                sum += probs_out[k];
            }
            for (int k = 0; k < c.classes; k++) probs_out[k] /= sum;
            loss += -log((double)probs_out[labels[b]] + 1e-30);
            for (int k = 0; k < c.classes; k++)
                dlogits[k] = (probs_out[k] - (k == labels[b] ? 1.f : 0.f))
                             / (float)B;
            backward_one(&c, &p, &gp, img, &a, dlogits, scratch);
        }
        loss /= B;
        /* AdamW (optax/torch semantics: decoupled decay, corrected moments) */
        float c1 = 1.0f - powf(b1, (float)s);
        float c2 = 1.0f - powf(b2, (float)s);
        for (size_t i = 0; i < p.n_params; i++) {
            float g = gp.arena[i];
            mu.arena[i] = b1 * mu.arena[i] + (1.f - b1) * g;
            nu.arena[i] = b2 * nu.arena[i] + (1.f - b2) * g * g;
            float mhat = mu.arena[i] / c1;
            float vhat = nu.arena[i] / c2;
            p.arena[i] -= lr * (mhat / (sqrtf(vhat) + eps)
                                + wd * p.arena[i]);
        }
        printf("step %d loss %.6f\n", s, loss);
    }

    FILE *of = fopen(argv[6], "wb");
    if (!of) { perror(argv[6]); return 1; }
    fwrite(header, sizeof(header), 1, of);
    fwrite(p.arena, sizeof(float), p.n_params, of);
    fclose(of);

    free(p.arena); free(gp.arena); free(mu.arena); free(nu.arena);
    free(labels); free(images); free(a.arena); free(scratch);
    free(logits); free(dlogits); free(probs_out);
    return 0;
}
