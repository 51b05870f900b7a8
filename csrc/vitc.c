/* vitc — standalone C reference implementation of the vitx Vision Transformer
 * forward pass.
 *
 * Role: the native cross-implementation oracle, mirroring the reference
 * project's llm.c-style C stack (/root/reference/csrc/vit.c) but (a) written
 * from the vitx spec, not translated, (b) COMPLETE — the reference C forward
 * stopped after an attention-only stack with no residuals/LN/MLP/head
 * (vit.c:419-438,443-484) — and (c) numerically correct: stable max-
 * subtracted softmax (reference C had none, vit.c:215-229) and 1/sqrt(d)
 * scaling.
 *
 * Model semantics match vitx.nn.vit with head_type="reference", mlp_act
 * configurable, final_norm off, qkv_bias off:
 *   patchify(conv-as-gather) -> prepend CLS -> +pos ->
 *   depth x [ x+=MHA(LN1(x)); x+=MLP(LN2(x)) ] -> head on token 0
 *   head: Linear(E,4E) -> GELU(erf) -> LayerNorm(4E) -> Linear(4E,classes)
 *
 * Memory: one arena allocation for params, one for activations (llm.c
 * pattern, same idea as reference vit_alloc, vit.c:489-600).
 *
 * Usage: vitc model.bin input.bin output.bin
 *   model.bin:  header (int32 magic 'VITC', version, image, patch, chans,
 *               classes, embed, depth, heads, mlp_ratio, act[0=gelu,1=relu])
 *               followed by fp32 params in the order written by
 *               vitx/interop/cbin.py.
 *   input.bin:  int32 B, then B*image*image*chans fp32 (NHWC, preprocessed).
 *   output.bin: B*classes fp32 logits.
 *
 * Build: gcc -O2 -o vitc vitc.c -lm        (add -fopenmp -DOMP for OpenMP)
 */

#include "vitc_core.h"

int main(int argc, char **argv) {
    if (argc != 4) {
        fprintf(stderr, "usage: %s model.bin input.bin output.bin\n", argv[0]);
        return 2;
    }
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

    FILE *inf = fopen(argv[2], "rb");
    if (!inf) { perror(argv[2]); return 1; }
    int B;
    read_exact(&B, sizeof(B), inf, "batch");
    size_t img_sz = (size_t)c.image_size * c.image_size * c.channels;
    float *images = xmalloc(sizeof(float) * B * img_sz);
    read_exact(images, sizeof(float) * B * img_sz, inf, "images");
    fclose(inf);

    size_t T = c.tokens, E = c.embed, M = c.mlp_dim;
    size_t scratch_sz = T * E * 4 + T * 3 * E + T * T + T * M;
    if (scratch_sz < (size_t)(8 * E + c.classes)) scratch_sz = 8 * E + c.classes;
    float *scratch = xmalloc(sizeof(float) * scratch_sz);
    float *logits = xmalloc(sizeof(float) * B * c.classes);

    for (int b = 0; b < B; b++)
        forward_one(&c, &p, images + (size_t)b * img_sz,
                    logits + (size_t)b * c.classes, scratch);

    FILE *of = fopen(argv[3], "wb");
    if (!of) { perror(argv[3]); return 1; }
    fwrite(logits, sizeof(float), (size_t)B * c.classes, of);
    fclose(of);

    printf("vitc: B=%d tokens=%d embed=%d depth=%d -> logits[0]:", B,
           c.tokens, c.embed, c.depth);
    for (int k = 0; k < (c.classes < 8 ? c.classes : 8); k++)
        printf(" %.6f", logits[k]);
    printf("\n");
    free(p.arena); free(images); free(scratch); free(logits);
    return 0;
}
