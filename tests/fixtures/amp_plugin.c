/* Minimal LADSPA amplifier plugin used as a ladspa_host test fixture. */
#include <stdlib.h>
#include <string.h>

typedef float LADSPA_Data;
typedef void *LADSPA_Handle;
typedef struct {
    int HintDescriptor;
    LADSPA_Data LowerBound, UpperBound;
} LADSPA_PortRangeHint;
typedef struct _LADSPA_Descriptor {
    unsigned long UniqueID;
    const char *Label;
    int Properties;
    const char *Name, *Maker, *Copyright;
    unsigned long PortCount;
    const int *PortDescriptors;
    const char *const *PortNames;
    const LADSPA_PortRangeHint *PortRangeHints;
    void *ImplementationData;
    LADSPA_Handle (*instantiate)(const struct _LADSPA_Descriptor *, unsigned long);
    void (*connect_port)(LADSPA_Handle, unsigned long, LADSPA_Data *);
    void (*activate)(LADSPA_Handle);
    void (*run)(LADSPA_Handle, unsigned long);
    void *run_adding, *set_run_adding_gain;
    void (*deactivate)(LADSPA_Handle);
    void (*cleanup)(LADSPA_Handle);
} LADSPA_Descriptor;

typedef struct { LADSPA_Data *gain, *in, *out; } Amp;

static LADSPA_Handle amp_inst(const LADSPA_Descriptor *d, unsigned long fs) {
    (void)d; (void)fs;
    return calloc(1, sizeof(Amp));
}
static void amp_conn(LADSPA_Handle h, unsigned long p, LADSPA_Data *b) {
    Amp *a = (Amp *)h;
    if (p == 0) a->gain = b;
    else if (p == 1) a->in = b;
    else a->out = b;
}
static void amp_run(LADSPA_Handle h, unsigned long n) {
    Amp *a = (Amp *)h;
    for (unsigned long i = 0; i < n; ++i) a->out[i] = a->in[i] * *a->gain;
}
static void amp_cleanup(LADSPA_Handle h) { free(h); }

static const int port_desc[3] = { 0x4|0x1, 0x8|0x1, 0x8|0x2 };
static const char *const port_names[3] = { "Gain", "Input", "Output" };
static const LADSPA_PortRangeHint hints[3] = {
    { 0x1|0x2|0x240, 0.0f, 10.0f },  /* bounded, default 1 */
    { 0, 0, 0 }, { 0, 0, 0 },
};
static const LADSPA_Descriptor amp_desc = {
    1001, "test_amp", 0x4, "Test Amplifier", "dsp_tpu", "ISC",
    3, port_desc, port_names, hints, 0,
    amp_inst, amp_conn, 0, amp_run, 0, 0, 0, amp_cleanup,
};

const LADSPA_Descriptor *ladspa_descriptor(unsigned long i) {
    return (i == 0) ? &amp_desc : 0;
}
