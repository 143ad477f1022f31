/* Complete C round trip against a running miotts-tpu server: health,
 * reference registration from a .emb.gguf, text->WAV, codes->WAV.
 *
 * This is the desktop analog of the reference's mobile demos
 * (examples/swiftui, examples/android): an app links the same
 * libmio_tpu_client and calls the same function surface the SwiftUI /
 * JNI bridges would.
 *
 * Build/run: see examples/README.md.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "mio_tpu_client.h"

int main(int argc, char ** argv) {
    const char * url = argc > 1 ? argv[1] : "http://127.0.0.1:18089";
    const char * emb = argc > 2 ? argv[2] : NULL;
    const char * out = argc > 3 ? argv[3] : "/tmp/c_client_demo.wav";
    char err[512];

    void * c = mio_tpu_client_create(url, err, sizeof err);
    if (!c) { fprintf(stderr, "connect failed: %s\n", err); return 1; }

    char * health = NULL;
    if (!mio_tpu_client_health_json(c, &health, err, sizeof err)) {
        fprintf(stderr, "health failed: %s\n", err);
        mio_tpu_client_destroy(c);
        return 1;
    }
    printf("health: %.120s...\n", health);
    mio_tpu_string_free(health);

    /* sampler defaults for subsequent synthesize calls */
    if (!mio_tpu_client_set_generation_params(
            c, /*n_predict=*/64, /*top_k=*/50, /*top_p=*/1.0f,
            /*temp=*/0.8f, /*repeat_penalty=*/1.0f, /*seed=*/42,
            err, sizeof err)) {
        fprintf(stderr, "set params failed: %s\n", err);
    }

    const char * key = "c_demo_voice";
    if (emb) {
        if (!mio_tpu_client_add_reference_from_gguf(c, key, emb, err,
                                                    sizeof err)) {
            fprintf(stderr, "add reference failed: %s\n", err);
            mio_tpu_client_destroy(c);
            return 1;
        }
        printf("registered %s from %s\n", key, emb);
    } else {
        key = ""; /* empty key: server may resolve a preloaded reference
                   * (NULL is rejected by the bridge as invalid) */
    }

    if (!mio_tpu_client_synthesize_to_wav(c, "Hello from the C client.",
                                          key, /*n_predict=*/48, out, err,
                                          sizeof err)) {
        fprintf(stderr, "synthesize failed: %s\n", err);
        mio_tpu_client_destroy(c);
        return 1;
    }
    printf("wrote %s\n", out);

    /* codes -> WAV bypasses the LLM (reference CLI test T6 shape) */
    int32_t codes[24];
    for (int i = 0; i < 24; i++) codes[i] = (i * 37) % 128;
    char out2[1024];
    snprintf(out2, sizeof out2, "%s.codes.wav", out);
    if (!mio_tpu_client_synthesize_codes_to_wav(c, codes, 24, key, out2, err,
                                                sizeof err)) {
        fprintf(stderr, "codes synthesize failed: %s\n", err);
        mio_tpu_client_destroy(c);
        return 1;
    }
    printf("wrote %s\n", out2);

    if (emb && !mio_tpu_client_remove_reference(c, key, err, sizeof err))
        fprintf(stderr, "remove reference failed: %s\n", err);

    mio_tpu_client_destroy(c);
    return 0;
}
