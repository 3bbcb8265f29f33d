/* C-ABI smoke test for libseamlessclone_tpu.so.
 *
 * Mirrors the reference CLI flow (seamlessClone_main.cu:69-94) from plain C:
 * create an instance, run a clone of a synthetic gradient patch into a flat
 * destination with a full mask, and check the blended interior actually
 * changed while the outside stayed untouched. The second run executes on a
 * DIFFERENT pthread, pinning the any-thread GIL contract (the embedded
 * interpreter must release the GIL after initialization or this deadlocks).
 *
 * Build/run: see native/Makefile (target `test`).
 */
#include <pthread.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "../include/seamlessclone_tpu.h"

struct run_args {
  void* inst;
  const unsigned char *face, *body, *mask;
  unsigned char* out;
  int fh, fw, bh, bw, rc;
};

static void* run_on_thread(void* p) {
  struct run_args* a = (struct run_args*)p;
  a->rc = sc_tpu_run(a->inst, a->face, a->fh, a->fw, a->body, a->bh, a->bw,
                     a->mask, a->fh, a->fw, a->bw / 2, a->bh / 2, a->out, 1);
  return NULL;
}

int main(void) {
  const int fh = 40, fw = 56;   /* source patch */
  const int bh = 120, bw = 160; /* destination */
  unsigned char* face = malloc((size_t)fh * fw * 3);
  unsigned char* body = malloc((size_t)bh * bw * 3);
  unsigned char* mask = malloc((size_t)fh * fw);
  unsigned char* out = malloc((size_t)bh * bw * 3);

  for (int y = 0; y < fh; y++)
    for (int x = 0; x < fw; x++)
      for (int c = 0; c < 3; c++)
        face[(y * fw + x) * 3 + c] = (unsigned char)((x * 4 + y * 2 + c * 40) % 256);
  memset(body, 128, (size_t)bh * bw * 3);
  memset(mask, 255, (size_t)fh * fw);

  /* force the CPU backend: this smoke test must not require TPU access */
  void* inst = sc_tpu_create_instance(-1, "{\"platform\": \"cpu\"}");
  if (!inst) {
    fprintf(stderr, "create_instance failed: %s\n", sc_tpu_last_error());
    return 1;
  }

  int rc = sc_tpu_run(inst, face, fh, fw, body, bh, bw, mask, fh, fw,
                      bw / 2, bh / 2, out, 1);
  if (rc != 0) {
    fprintf(stderr, "run failed: %s\n", sc_tpu_last_error());
    return 1;
  }
  if (sc_tpu_sync(inst) != 0) {
    fprintf(stderr, "sync failed: %s\n", sc_tpu_last_error());
    return 1;
  }

  /* interior must have changed, corners must be untouched */
  long changed = 0;
  for (long i = 0; i < (long)bh * bw * 3; i++)
    if (out[i] != 128) changed++;
  int corner_ok = out[0] == 128 && out[(long)(bh - 1) * bw * 3] == 128;
  printf("changed=%ld corner_ok=%d\n", changed, corner_ok);

  /* second run on the same instance FROM ANOTHER THREAD (serve-mode reuse,
   * zero recompiles, any-thread GIL contract) */
  struct run_args a = {inst, face, body, mask, out, fh, fw, bh, bw, -1};
  pthread_t th;
  if (pthread_create(&th, NULL, run_on_thread, &a) != 0 ||
      pthread_join(th, NULL) != 0 || a.rc != 0) {
    fprintf(stderr, "cross-thread run failed: %s\n", sc_tpu_last_error());
    return 1;
  }
  printf("cross-thread run OK\n");
  sc_tpu_destroy(inst);

  if (changed < 1000 || !corner_ok) {
    fprintf(stderr, "FAIL: blended output looks wrong\n");
    return 1;
  }
  printf("C ABI smoke test PASSED\n");
  return 0;
}
