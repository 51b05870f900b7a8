/* vitc_core.h — shared core of the vitc C oracle: config/params layout,
 * arena carving, LN/matmul/softmax/GELU primitives and the full forward.
 * Used by vitc.c (inference CLI) and trainc.c (training-step CLI).
 * See vitc.c for provenance notes vs the reference csrc/vit.c. */
#ifndef VITC_CORE_H
#define VITC_CORE_H

#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#ifdef OMP
#include <omp.h>
#endif

#define MAGIC 0x43544956 /* "VITC" little-endian */

typedef struct {
    int image_size, patch_size, channels, classes;
    int embed, depth, heads, mlp_ratio, act; /* act: 0 gelu, 1 relu */
    int grid, patches, tokens, head_dim, mlp_dim;
} Config;

typedef struct {
    /* all pointers are views into one arena */
    float *patch_kernel; /* (P*P*C, E) */
    float *patch_bias;   /* (E,) */
    float *cls;          /* (E,) */
    float *pos;          /* (T, E) */
    /* per layer, stacked: */
    float *ln1_s, *ln1_b;  /* (L, E) */
    float *wqkv;           /* (L, E, 3, H, D) */
    float *wo;             /* (L, E, E) */
    float *bo;             /* (L, E) */
    float *ln2_s, *ln2_b;  /* (L, E) */
    float *w1;             /* (L, E, M) */
    float *b1;             /* (L, M) */
    float *w2;             /* (L, M, E) */
    float *b2;             /* (L, E) */
    /* head */
    float *hw1;            /* (E, 4E) */
    float *hb1;            /* (4E,) */
    float *hln_s, *hln_b;  /* (4E,) */
    float *hw2;            /* (4E, classes) */
    float *hb2;            /* (classes,) */
    float *arena;
    size_t n_params;
} Params;

static void *xmalloc(size_t n) {
    void *p = malloc(n);
    if (!p) { fprintf(stderr, "OOM allocating %zu bytes\n", n); exit(1); }
    return p;
}

static size_t param_count(const Config *c) {
    size_t P = (size_t)c->patch_size, C = c->channels, E = c->embed;
    size_t L = c->depth, M = c->mlp_dim, T = c->tokens, K = c->classes;
    size_t n = 0;
    n += P * P * C * E + E;          /* patch */
    n += E + T * E;                  /* cls + pos */
    n += L * (2 * E);                /* ln1 */
    n += L * E * 3 * E;              /* wqkv (3*H*D == 3*E) */
    n += L * (E * E + E);            /* wo + bo */
    n += L * (2 * E);                /* ln2 */
    n += L * (E * M + M + M * E + E);/* mlp */
    n += E * 4 * E + 4 * E;          /* head w1 */
    n += 4 * E + 4 * E;              /* head ln */
    n += 4 * E * K + K;              /* head w2 */
    return n;
}

static void carve(Params *p, const Config *c) {
    size_t P = (size_t)c->patch_size, C = c->channels, E = c->embed;
    size_t L = c->depth, M = c->mlp_dim, T = c->tokens, K = c->classes;
    float *a = p->arena;
    p->patch_kernel = a; a += P * P * C * E;
    p->patch_bias = a; a += E;
    p->cls = a; a += E;
    p->pos = a; a += T * E;
    p->ln1_s = a; a += L * E;
    p->ln1_b = a; a += L * E;
    p->wqkv = a; a += L * E * 3 * E;
    p->wo = a; a += L * E * E;
    p->bo = a; a += L * E;
    p->ln2_s = a; a += L * E;
    p->ln2_b = a; a += L * E;
    p->w1 = a; a += L * E * M;
    p->b1 = a; a += L * M;
    p->w2 = a; a += L * M * E;
    p->b2 = a; a += L * E;
    p->hw1 = a; a += E * 4 * E;
    p->hb1 = a; a += 4 * E;
    p->hln_s = a; a += 4 * E;
    p->hln_b = a; a += 4 * E;
    p->hw2 = a; a += 4 * E * K;
    p->hb2 = a; a += K;
    if ((size_t)(a - p->arena) != p->n_params) {
        fprintf(stderr, "arena carve mismatch: %zu vs %zu\n",
                (size_t)(a - p->arena), p->n_params);
        exit(1);
    }
}

static void layer_norm(const float *x, float *out, const float *scale,
                       const float *bias, int rows, int dim) {
#ifdef OMP
#pragma omp parallel for
#endif
    for (int r = 0; r < rows; r++) {
        const float *row = x + (size_t)r * dim;
        float mean = 0.f, var = 0.f;
        for (int i = 0; i < dim; i++) mean += row[i];
        mean /= dim;
        for (int i = 0; i < dim; i++) {
            float d = row[i] - mean;
            var += d * d;
        }
        var /= dim;
        float inv = 1.0f / sqrtf(var + 1e-5f);
        float *o = out + (size_t)r * dim;
        for (int i = 0; i < dim; i++)
            o[i] = (row[i] - mean) * inv * scale[i] + bias[i];
    }
}

/* out(rows,n) = x(rows,k) @ w(k,n) + b(n)   [b may be NULL] */
static void matmul(const float *x, const float *w, const float *b,
                   float *out, int rows, int k, int n) {
#ifdef OMP
#pragma omp parallel for
#endif
    for (int r = 0; r < rows; r++) {
        const float *xr = x + (size_t)r * k;
        float *o = out + (size_t)r * n;
        if (b) memcpy(o, b, sizeof(float) * n);
        else memset(o, 0, sizeof(float) * n);
        for (int i = 0; i < k; i++) {
            float xi = xr[i];
            const float *wr = w + (size_t)i * n;
            for (int j = 0; j < n; j++) o[j] += xi * wr[j];
        }
    }
}

/* stable softmax over the last dim, in place */
static void softmax_rows(float *x, int rows, int dim) {
    for (int r = 0; r < rows; r++) {
        float *row = x + (size_t)r * dim;
        float m = row[0];
        for (int i = 1; i < dim; i++) if (row[i] > m) m = row[i];
        float sum = 0.f;
        for (int i = 0; i < dim; i++) { row[i] = expf(row[i] - m); sum += row[i]; }
        float inv = 1.0f / sum;
        for (int i = 0; i < dim; i++) row[i] *= inv;
    }
}

static float gelu_erf(float x) {
    return 0.5f * x * (1.0f + erff(x * 0.70710678118654752f));
}

/* Full forward for one image. Scratch layout documented inline. */
static void forward_one(const Config *c, const Params *p, const float *image,
                        float *logits, float *scratch) {
    int T = c->tokens, E = c->embed, H = c->heads, D = c->head_dim;
    int M = c->mlp_dim, P = c->patch_size, g = c->grid, C = c->channels;
    int S = c->image_size;
    float *x = scratch;                 /* (T, E) running tokens */
    float *h = x + (size_t)T * E;       /* (T, E) LN output */
    float *qkv = h + (size_t)T * E;     /* (T, 3E) */
    float *att = qkv + (size_t)T * 3 * E; /* (T, T) one head's scores */
    float *ao = att + (size_t)T * T;    /* (T, E) attention concat output */
    float *mlp = ao + (size_t)T * E;    /* (T, M) mlp hidden */

    /* patchify: conv(stride=patch) as gather+dot; token row n+1 (CLS at 0) */
#ifdef OMP
#pragma omp parallel for collapse(2)
#endif
    for (int n = 0; n < c->patches; n++) {
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
    }
    memcpy(x, p->cls, sizeof(float) * E);          /* CLS prepended */
    for (int t = 0; t < T; t++)
        for (int e = 0; e < E; e++)
            x[(size_t)t * E + e] += p->pos[(size_t)t * E + e];

    float scale = 1.0f / sqrtf((float)D);
    for (int l = 0; l < c->depth; l++) {
        size_t le = (size_t)l * E;
        /* --- attention --- */
        layer_norm(x, h, p->ln1_s + le, p->ln1_b + le, T, E);
        matmul(h, p->wqkv + (size_t)l * E * 3 * E, NULL, qkv, T, E, 3 * E);
        /* qkv row layout: [q(H,D) | k(H,D) | v(H,D)] per token */
#ifdef OMP
#pragma omp parallel for
#endif
        for (int hh = 0; hh < H; hh++) {
            float *atth = att;
#ifdef OMP
            /* per-thread score buffer: heads run in parallel */
            atth = (float *)malloc(sizeof(float) * (size_t)T * T);
#endif
            for (int i = 0; i < T; i++)
                for (int j = 0; j < T; j++) {
                    const float *qi = qkv + (size_t)i * 3 * E + (size_t)hh * D;
                    const float *kj = qkv + (size_t)j * 3 * E + E + (size_t)hh * D;
                    float s = 0.f;
                    for (int d = 0; d < D; d++) s += qi[d] * kj[d];
                    atth[(size_t)i * T + j] = s * scale;
                }
            softmax_rows(atth, T, T);
            for (int i = 0; i < T; i++) {
                float *o = ao + (size_t)i * E + (size_t)hh * D;
                for (int d = 0; d < D; d++) o[d] = 0.f;
                for (int j = 0; j < T; j++) {
                    float w = atth[(size_t)i * T + j];
                    const float *vj = qkv + (size_t)j * 3 * E + 2 * E
                                      + (size_t)hh * D;
                    for (int d = 0; d < D; d++) o[d] += w * vj[d];
                }
            }
#ifdef OMP
            free(atth);
#endif
        }
        /* output projection + residual */
        matmul(ao, p->wo + (size_t)l * E * E, p->bo + le, h, T, E, E);
        for (size_t i = 0; i < (size_t)T * E; i++) x[i] += h[i];

        /* --- mlp --- */
        layer_norm(x, h, p->ln2_s + le, p->ln2_b + le, T, E);
        matmul(h, p->w1 + (size_t)l * E * M, p->b1 + (size_t)l * M,
               mlp, T, E, M);
        if (c->act == 1) {
            for (size_t i = 0; i < (size_t)T * M; i++)
                if (mlp[i] < 0) mlp[i] = 0;
        } else {
            for (size_t i = 0; i < (size_t)T * M; i++)
                mlp[i] = gelu_erf(mlp[i]);
        }
        matmul(mlp, p->w2 + (size_t)l * M * E, p->b2 + le, h, T, M, E);
        for (size_t i = 0; i < (size_t)T * E; i++) x[i] += h[i];
    }

    /* --- classifier head on token 0 --- */
    int E4 = 4 * E;
    float *hh1 = mlp;                   /* reuse scratch (E4 <= T*M) */
    matmul(x, p->hw1, p->hb1, hh1, 1, E, E4);
    for (int i = 0; i < E4; i++) hh1[i] = gelu_erf(hh1[i]);
    layer_norm(hh1, hh1 + E4, p->hln_s, p->hln_b, 1, E4);
    matmul(hh1 + E4, p->hw2, p->hb2, logits, 1, E4, c->classes);
}

static void read_exact(void *dst, size_t n, FILE *f, const char *what) {
    if (fread(dst, 1, n, f) != n) {
        fprintf(stderr, "short read: %s\n", what);
        exit(1);
    }
}


#endif /* VITC_CORE_H */
