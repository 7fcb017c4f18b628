/* ladspa_dsp bridge: expose dsp_tpu effects chains as a LADSPA plugin
 * (the native analog of the reference's ladspa_dsp.c).
 *
 * The reference builds the whole chain engine into a C .so
 * (ladspa_dsp.c:482-486). Here the engine is the JAX runtime, which cannot
 * be embedded in an arbitrary LADSPA host process, so each plugin instance
 * spawns a worker subprocess (python -m dsp_tpu.plugin_worker) and streams
 * float32 blocks over pipes. Config discovery matches the reference
 * (ladspa_dsp.c:221-248): $LADSPA_DSP_CONFIG_PATH, then
 * $XDG_CONFIG_HOME/ladspa_dsp, ~/.config/ladspa_dsp, /etc/ladspa_dsp; files
 * named "config" (label "ladspa_dsp") or "config_<name>"
 * (label "ladspa_dsp:<name>"). Port layout: input_channels audio inputs then
 * output_channels audio outputs, audio-only (like the reference).
 *
 * Latency: frames-in == frames-out with ZERO added latency for hosts that
 * call run() with a constant block size (the worker compiles the chain for
 * the first call's block, matching the reference's SYMMETRIC_IO build);
 * hosts that vary the block size fall back to silence-padded carry
 * buffering in the worker (dsp_tpu.plugin.Plugin). The pipe round trip per
 * run() call remains.
 */

#define _GNU_SOURCE
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>
#include <unistd.h>
#include <dirent.h>
#include <sys/types.h>
#include <sys/wait.h>
#include <sys/socket.h>
#include <errno.h>

/* --- LADSPA ABI (layout-compatible with ladspa.h) --- */
typedef float LADSPA_Data;
typedef void *LADSPA_Handle;
typedef int LADSPA_Properties;
typedef int LADSPA_PortDescriptor;
typedef int LADSPA_PortRangeHintDescriptor;

#define LADSPA_PORT_INPUT 0x1
#define LADSPA_PORT_OUTPUT 0x2
#define LADSPA_PORT_AUDIO 0x8
#define LADSPA_PROPERTY_HARD_RT_CAPABLE 0x4

typedef struct {
    LADSPA_PortRangeHintDescriptor HintDescriptor;
    LADSPA_Data LowerBound, UpperBound;
} LADSPA_PortRangeHint;

typedef struct _LADSPA_Descriptor {
    unsigned long UniqueID;
    const char *Label;
    LADSPA_Properties Properties;
    const char *Name, *Maker, *Copyright;
    unsigned long PortCount;
    const LADSPA_PortDescriptor *PortDescriptors;
    const char *const *PortNames;
    const LADSPA_PortRangeHint *PortRangeHints;
    void *ImplementationData;
    LADSPA_Handle (*instantiate)(const struct _LADSPA_Descriptor *, unsigned long);
    void (*connect_port)(LADSPA_Handle, unsigned long, LADSPA_Data *);
    void (*activate)(LADSPA_Handle);
    void (*run)(LADSPA_Handle, unsigned long);
    void (*run_adding)(LADSPA_Handle, unsigned long, LADSPA_Data);
    void (*set_run_adding_gain)(LADSPA_Handle, LADSPA_Data);
    void (*deactivate)(LADSPA_Handle);
    void (*cleanup)(LADSPA_Handle);
} LADSPA_Descriptor;

/* --- config discovery --- */

struct cfg_entry {
    char *name;   /* NULL for the default config */
    char *label;  /* "ladspa_dsp" or "ladspa_dsp:<name>" */
    int in_ch, out_ch;
};

static struct cfg_entry *g_cfgs = NULL;
static int g_n_cfgs = 0;
static LADSPA_Descriptor *g_descs = NULL;

static void parse_config_channels(const char *path, int *in_ch, int *out_ch)
{
    *in_ch = 1;
    *out_ch = 1;
    FILE *f = fopen(path, "r");
    if (!f) return;
    char line[4096];
    while (fgets(line, sizeof(line), f)) {
        char *eq = strchr(line, '=');
        if (!eq) continue;
        *eq = '\0';
        char *key = line, *val = eq + 1;
        while (*key == ' ' || *key == '\t') ++key;
        char *e = key + strlen(key);
        while (e > key && (e[-1] == ' ' || e[-1] == '\t')) *--e = '\0';
        if (strcmp(key, "input_channels") == 0) *in_ch = atoi(val);
        else if (strcmp(key, "output_channels") == 0) *out_ch = atoi(val);
        else if (strcmp(key, "effects_chain") == 0) { /* chain parsed by worker */ }
    }
    fclose(f);
}

static void add_config(const char *dir, const char *fname)
{
    const char *suffix = NULL;
    if (strcmp(fname, "config") == 0) suffix = NULL;
    else if (strncmp(fname, "config_", 7) == 0) suffix = fname + 7;
    else return;
    /* first dir wins for a given name (reference path precedence) */
    for (int i = 0; i < g_n_cfgs; ++i) {
        const char *n = g_cfgs[i].name ? g_cfgs[i].name : "";
        if (strcmp(n, suffix ? suffix : "") == 0) return;
    }
    char path[4096];
    snprintf(path, sizeof(path), "%s/%s", dir, fname);
    int in_ch, out_ch;
    parse_config_channels(path, &in_ch, &out_ch);
    if (in_ch < 1 || out_ch < 1) return;
    g_cfgs = realloc(g_cfgs, (g_n_cfgs + 1) * sizeof(*g_cfgs));
    struct cfg_entry *c = &g_cfgs[g_n_cfgs++];
    c->name = suffix ? strdup(suffix) : NULL;
    if (suffix) {
        c->label = malloc(strlen(suffix) + 16);
        sprintf(c->label, "ladspa_dsp:%s", suffix);
    } else {
        c->label = strdup("ladspa_dsp");
    }
    c->in_ch = in_ch;
    c->out_ch = out_ch;
}

static void scan_dir(const char *dir)
{
    DIR *d = opendir(dir);
    if (!d) return;
    struct dirent *e;
    while ((e = readdir(d)) != NULL)
        add_config(dir, e->d_name);
    closedir(d);
}

static void discover(void)
{
    const char *p = getenv("LADSPA_DSP_CONFIG_PATH");
    if (p && *p) {
        char *dup = strdup(p), *save = NULL;
        for (char *tok = strtok_r(dup, ":", &save); tok; tok = strtok_r(NULL, ":", &save))
            scan_dir(tok);
        free(dup);
        return; /* explicit path overrides the defaults, like the reference */
    }
    const char *xdg = getenv("XDG_CONFIG_HOME");
    char buf[4096];
    if (xdg && *xdg) {
        snprintf(buf, sizeof(buf), "%s/ladspa_dsp", xdg);
        scan_dir(buf);
    } else {
        const char *home = getenv("HOME");
        if (home) {
            snprintf(buf, sizeof(buf), "%s/.config/ladspa_dsp", home);
            scan_dir(buf);
        }
    }
    scan_dir("/etc/ladspa_dsp");
}

/* --- instance: worker subprocess over pipes --- */

struct instance {
    const struct cfg_entry *cfg;
    unsigned long rate;
    pid_t pid;
    int to_child, from_child;
    LADSPA_Data **ports; /* in_ch inputs then out_ch outputs */
    float *scratch;
    unsigned long scratch_cap;
    int dead;
};

static int read_full(int fd, void *buf, size_t n)
{
    size_t got = 0;
    while (got < n) {
        ssize_t r = read(fd, (char *)buf + got, n - got);
        if (r <= 0) {
            if (r < 0 && errno == EINTR) continue;
            return -1;
        }
        got += (size_t)r;
    }
    return 0;
}

static int write_full(int fd, const void *buf, size_t n)
{
    /* MSG_NOSIGNAL (the fds are an AF_UNIX socketpair) turns a dead worker
     * into EPIPE instead of SIGPIPE, so the host's signal handlers are never
     * touched (the previous pipe-based version had to set a process-global
     * SIG_IGN, silently overriding the host). */
    size_t done = 0;
    while (done < n) {
        ssize_t r = send(fd, (const char *)buf + done, n - done, MSG_NOSIGNAL);
        if (r < 0) {
            if (errno == EINTR) continue;
            return -1;
        }
        done += (size_t)r;
    }
    return 0;
}

static LADSPA_Handle bridge_instantiate(const LADSPA_Descriptor *d, unsigned long rate)
{
    const struct cfg_entry *cfg = (const struct cfg_entry *)d->ImplementationData;
    /* one bidirectional AF_UNIX socketpair: lets write_full() use
     * send(..., MSG_NOSIGNAL) so a dead worker can't SIGPIPE the host */
    int sv[2];
    if (socketpair(AF_UNIX, SOCK_STREAM, 0, sv)) return NULL;
    pid_t pid = fork();
    if (pid < 0) { close(sv[0]); close(sv[1]); return NULL; }
    if (pid == 0) {
        dup2(sv[1], 0);
        dup2(sv[1], 1);
        close(sv[0]); close(sv[1]);
        const char *py = getenv("DSP_TPU_PLUGIN_PYTHON");
        if (!py || !*py) py = "python3";
        char rate_s[32];
        snprintf(rate_s, sizeof(rate_s), "%lu", rate);
        execlp(py, py, "-m", "dsp_tpu.plugin_worker",
               cfg->name ? cfg->name : "", rate_s, (char *)NULL);
        _exit(127);
    }
    close(sv[1]);
    struct instance *h = calloc(1, sizeof(*h));
    h->cfg = cfg;
    h->rate = rate;
    h->pid = pid;
    h->to_child = sv[0];
    h->from_child = sv[0];
    h->ports = calloc(cfg->in_ch + cfg->out_ch, sizeof(LADSPA_Data *));
    /* handshake: worker sends 4-byte magic after the chain compiles */
    uint32_t magic = 0;
    if (read_full(h->from_child, &magic, 4) != 0 || magic != 0x50534444u /* "DDSP" */) {
        h->dead = 1;
    }
    return h;
}

static void bridge_connect_port(LADSPA_Handle inst, unsigned long port, LADSPA_Data *loc)
{
    struct instance *h = (struct instance *)inst;
    if (port < (unsigned long)(h->cfg->in_ch + h->cfg->out_ch))
        h->ports[port] = loc;
}

static void bridge_run(LADSPA_Handle inst, unsigned long n)
{
    struct instance *h = (struct instance *)inst;
    const int ic = h->cfg->in_ch, oc = h->cfg->out_ch;
    if (n == 0) return; /* a 0 header is the worker-shutdown sentinel, and
                           LADSPA hosts may legally call run(0) */
    if (h->dead) {
        for (int c = 0; c < oc; ++c)
            if (h->ports[ic + c]) memset(h->ports[ic + c], 0, n * sizeof(LADSPA_Data));
        return;
    }
    unsigned long need = n * (unsigned long)(ic > oc ? ic : oc);
    if (need > h->scratch_cap) {
        free(h->scratch);
        h->scratch = malloc(need * sizeof(float));
        h->scratch_cap = need;
    }
    for (unsigned long i = 0; i < n; ++i)
        for (int c = 0; c < ic; ++c)
            h->scratch[i * ic + c] = h->ports[c] ? h->ports[c][i] : 0.0f;
    uint32_t hdr = (uint32_t)n;
    if (write_full(h->to_child, &hdr, 4) != 0 ||
        write_full(h->to_child, h->scratch, n * ic * sizeof(float)) != 0 ||
        read_full(h->from_child, h->scratch, n * oc * sizeof(float)) != 0) {
        h->dead = 1;
        for (int c = 0; c < oc; ++c)
            if (h->ports[ic + c]) memset(h->ports[ic + c], 0, n * sizeof(LADSPA_Data));
        return;
    }
    for (unsigned long i = 0; i < n; ++i)
        for (int c = 0; c < oc; ++c)
            if (h->ports[ic + c]) h->ports[ic + c][i] = h->scratch[i * oc + c];
}

static void bridge_cleanup(LADSPA_Handle inst)
{
    struct instance *h = (struct instance *)inst;
    uint32_t zero = 0;
    if (!h->dead) write_full(h->to_child, &zero, 4);
    close(h->to_child); /* to_child == from_child (one socketpair end) */
    if (h->pid > 0) waitpid(h->pid, NULL, 0);
    free(h->ports);
    free(h->scratch);
    free(h);
}

/* --- descriptor table --- */

static void build_descriptors(void)
{
    discover();
    if (g_n_cfgs == 0) {
        /* fallback "null" entry like the reference (ladspa_dsp.c:402-409) */
        g_cfgs = calloc(1, sizeof(*g_cfgs));
        g_cfgs[0].name = NULL;
        g_cfgs[0].label = strdup("ladspa_dsp");
        g_cfgs[0].in_ch = 1;
        g_cfgs[0].out_ch = 1;
        g_n_cfgs = 1;
    }
    g_descs = calloc(g_n_cfgs, sizeof(*g_descs));
    for (int i = 0; i < g_n_cfgs; ++i) {
        struct cfg_entry *c = &g_cfgs[i];
        int np = c->in_ch + c->out_ch;
        LADSPA_PortDescriptor *pd = calloc(np, sizeof(*pd));
        const char **pn = calloc(np, sizeof(*pn));
        LADSPA_PortRangeHint *ph = calloc(np, sizeof(*ph));
        for (int p = 0; p < np; ++p) {
            int is_in = p < c->in_ch;
            pd[p] = (is_in ? LADSPA_PORT_INPUT : LADSPA_PORT_OUTPUT) | LADSPA_PORT_AUDIO;
            char *nm = malloc(32);
            snprintf(nm, 32, "%s%d", is_in ? "Input" : "Output", is_in ? p : p - c->in_ch);
            pn[p] = nm;
        }
        LADSPA_Descriptor *d = &g_descs[i];
        d->UniqueID = 2378 + (unsigned long)i; /* arbitrary private range */
        d->Label = c->label;
        d->Properties = 0;
        d->Name = "dsp_tpu effects chain";
        d->Maker = "dsp_tpu";
        d->Copyright = "ISC";
        d->PortCount = (unsigned long)np;
        d->PortDescriptors = pd;
        d->PortNames = pn;
        d->PortRangeHints = ph;
        d->ImplementationData = c;
        d->instantiate = bridge_instantiate;
        d->connect_port = bridge_connect_port;
        d->run = bridge_run;
        d->cleanup = bridge_cleanup;
    }
}

const LADSPA_Descriptor *ladspa_descriptor(unsigned long index)
{
    if (!g_descs) build_descriptors();
    if ((int)index >= g_n_cfgs) return NULL;
    return &g_descs[index];
}
